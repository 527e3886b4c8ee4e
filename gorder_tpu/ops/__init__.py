from .pallas_p2 import make_pallas_order_step, pallas_supported

__all__ = ["make_pallas_order_step", "pallas_supported"]
