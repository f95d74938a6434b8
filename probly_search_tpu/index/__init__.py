from .core import Index, QueryResult, DocumentDetails, DocumentPointer, FieldDetails
from .segment import Segment

__all__ = [
    "Index",
    "QueryResult",
    "DocumentDetails",
    "DocumentPointer",
    "FieldDetails",
    "Segment",
]
