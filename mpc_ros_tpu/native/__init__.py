from .runtime import Topic, RateLoop, NativeCsvLogger, get_lib

__all__ = ["Topic", "RateLoop", "NativeCsvLogger", "get_lib"]
