from .loader import Rulesets, load_rulesets, broadcast_rulesets

__all__ = ["Rulesets", "load_rulesets", "broadcast_rulesets"]
