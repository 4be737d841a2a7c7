from .engine import Engine, FakeEngine, JaxEngine
from .session import RettoSession

__all__ = ["RettoSession", "Engine", "JaxEngine", "FakeEngine"]
