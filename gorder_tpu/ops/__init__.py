from .pallas_p2 import make_pallas_order_step, pallas_supported  # noqa: F401

__all__ = ["make_pallas_order_step", "pallas_supported"]
