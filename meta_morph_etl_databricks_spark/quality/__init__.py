from .dup_gate import DuplicateException, assert_unique
from .reconcile import reconcile

__all__ = ["DuplicateException", "assert_unique", "reconcile"]
