"""Serving: AOT export, REST server with micro-batching, handler, client."""

from .export import export_model, load_exported
from .handler import DBTextDetectionHandler
from .server import make_server

__all__ = ["export_model", "load_exported", "DBTextDetectionHandler",
           "make_server"]
