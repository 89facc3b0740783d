from .events import sessionize, tumbling_window_agg

__all__ = ["sessionize", "tumbling_window_agg"]
