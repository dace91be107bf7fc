"""Shared utilities: logging/global state, checkpoint IO, TensorBoard
reporting, camera-json loading."""

from .logging import set_global_state, get_logger

__all__ = ["set_global_state", "get_logger"]
