from .runtime import Topic, ShmTopic, RateLoop, NativeCsvLogger, get_lib

__all__ = ["Topic", "ShmTopic", "RateLoop", "NativeCsvLogger", "get_lib"]
