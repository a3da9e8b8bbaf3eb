"""Descriptors: operation modifier flags.

Mirrors the reference's ``Descriptor`` (``pygraphblas/descriptor.py:10``,
flag semantics at ``:22-51``, singletons at ``:148-182``):

- ``T0`` / ``T1`` — use the transpose of the first / second input;
- ``C``  — complement the mask (write where mask is absent/false);
- ``S``  — structural mask (presence only, ignore stored values);
- ``R``  — replace: clear the output object before writing (without R,
  pre-existing output entries outside the mask survive).

In Spark terms these are plan-construction switches, not runtime flags:
T0/T1 swap the (src, dst) projection of an input; C turns a semi-join into
an anti-join; S drops the value predicate from the mask join; R decides
whether unmasked rows of the old output are unioned back in.
"""

from __future__ import annotations

import contextvars
from dataclasses import dataclass

# `with T0: A.mxm(B)` applies the descriptor without passing it —
# mirrors the reference's current_desc (descriptor.py:7,70-74).
current_desc: contextvars.ContextVar = contextvars.ContextVar(
    "current_desc", default=None
)


@dataclass(frozen=True)
class Descriptor:
    transpose0: bool = False
    transpose1: bool = False
    mask_complement: bool = False
    mask_structural: bool = False
    replace: bool = False

    def __and__(self, other: "Descriptor") -> "Descriptor":
        """Combine descriptors, as the reference allows (descriptor.py:119-141)."""
        return Descriptor(
            self.transpose0 or other.transpose0,
            self.transpose1 or other.transpose1,
            self.mask_complement or other.mask_complement,
            self.mask_structural or other.mask_structural,
            self.replace or other.replace,
        )

    def __enter__(self) -> "Descriptor":
        object.__setattr__(self, "_cv_token", current_desc.set(self))
        return self

    def __exit__(self, *exc) -> None:
        current_desc.reset(object.__getattribute__(self, "_cv_token"))


def resolve(desc: "Descriptor | None") -> "Descriptor":
    """Contextvar fallback (reference _get_args, matrix.py:2393-2397):
    an unspecified descriptor (None or the NULL singleton) resolves to
    the active ``with <desc>:`` scope, else NULL."""
    if desc is None or desc is NULL:
        return current_desc.get() or NULL
    return desc


NULL = Descriptor()
T0 = Descriptor(transpose0=True)
T1 = Descriptor(transpose1=True)
T0T1 = Descriptor(transpose0=True, transpose1=True)
C = Descriptor(mask_complement=True)
S = Descriptor(mask_structural=True)
R = Descriptor(replace=True)
RC = Descriptor(replace=True, mask_complement=True)
RS = Descriptor(replace=True, mask_structural=True)
RSC = Descriptor(replace=True, mask_structural=True, mask_complement=True)
CT0 = Descriptor(mask_complement=True, transpose0=True)
RCT0 = Descriptor(replace=True, mask_complement=True, transpose0=True)
ST0 = Descriptor(mask_structural=True, transpose0=True)
ST1 = Descriptor(mask_structural=True, transpose1=True)
