from .explain import (
    assert_no_exchange,
    assert_physical_contains,
    physical_plan,
)

__all__ = ["physical_plan", "assert_physical_contains", "assert_no_exchange"]
