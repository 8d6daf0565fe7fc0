from .joins import equi_join, join_reference_style, STRATEGIES

__all__ = ["equi_join", "join_reference_style", "STRATEGIES"]
