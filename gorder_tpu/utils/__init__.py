from .timers import PhaseTimers, timers

__all__ = ["PhaseTimers", "timers"]
