"""Scalar: a 0-or-1-valued cell, for API parity with the reference
(``pygraphblas/scalar.py:16``). In the reference it exists mainly as a
``select`` thunk holder; here it is a thin typed box around a Python value
(a collected 1-cell DataFrame collapses to this)."""

from __future__ import annotations

from pygraphblas_spark import gbtypes


class Scalar:
    def __init__(self, value=None, typ: str | None = None):
        self.value = value
        self.typ = (typ or (gbtypes.from_python_value(value) if value is not None else "FP64")).upper()

    @classmethod
    def from_value(cls, value) -> "Scalar":
        return cls(value)

    @classmethod
    def from_type(cls, typ) -> "Scalar":
        """Empty scalar of a type (reference scalar.py:42)."""
        return cls(None, str(typ))

    def dup(self) -> "Scalar":
        """Copy (reference scalar.py:35)."""
        return Scalar(self.value, self.typ)

    @property
    def gb_type(self):
        """First-class type object (reference scalar.py:59)."""
        return gbtypes.GBType(self.typ)

    type = gb_type

    def wait(self) -> "Scalar":
        """No-op materialization barrier (reference scalar.py:81) — a
        Scalar holds a plain Python value, nothing is pending."""
        return self

    def __len__(self) -> int:
        return self.nvals

    @property
    def nvals(self) -> int:
        return 0 if self.value is None else 1

    def clear(self) -> None:
        self.value = None

    def __getitem__(self, _):
        return self.value

    def __setitem__(self, _, v):
        self.value = v

    def __bool__(self):
        return self.value is not None

    def __eq__(self, other):
        if isinstance(other, Scalar):
            return self.value == other.value
        return self.value == other

    __hash__ = object.__hash__

    def __repr__(self):
        return f"<Scalar {self.typ} {self.value!r}>"
