from . import powder  # noqa: F401

__all__ = ["powder"]
