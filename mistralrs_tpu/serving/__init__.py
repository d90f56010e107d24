"""HTTP serving front end (the analog of `mistralrs-server-core`)."""

from .server import build_app, ServerState

__all__ = ["build_app", "ServerState"]
