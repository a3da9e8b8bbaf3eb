"""GraphBLAS exception hierarchy (reference base.py:133-180).

The reference maps GrB_Info error codes to exception classes; the one
with user-facing control flow is ``NoValue`` — ``A[i, j]`` raises it when
the element is absent, and ``Matrix.get``/``Vector.get`` catch it. The
engine raises the same class from ``__getitem__`` so ported reference
code (``try: x = A[i, j] except NoValue: ...``) works unchanged. The
remaining classes exist so `except GraphBLASException` umbrella handlers
port cleanly.
"""

from __future__ import annotations


class GraphBLASException(Exception):
    pass


class NoValue(GraphBLASException):
    pass


class UninitializedObject(GraphBLASException):
    pass


class InvalidObject(GraphBLASException):
    pass


class NullPointer(GraphBLASException):
    pass


class InvalidValue(GraphBLASException):
    pass


class InvalidIndex(GraphBLASException):
    pass


class DomainMismatch(GraphBLASException):
    pass


class DimensionMismatch(GraphBLASException):
    pass


class OutputNotEmpty(GraphBLASException):
    pass


class OutOfMemory(GraphBLASException):
    pass


class InsufficientSpace(GraphBLASException):
    pass


class IndexOutOfBound(GraphBLASException):
    pass


class Panic(GraphBLASException):
    pass
