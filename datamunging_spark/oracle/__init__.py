from .munge import munge_document, Span, DocMetrics

__all__ = ["munge_document", "Span", "DocMetrics"]
