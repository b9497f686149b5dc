"""Execution traces (parity: ``TraceTable``, ``provers/stark/src/trace.rs:20``).

A trace is a device digit array (K, num_columns, num_rows) in Montgomery
form.  Construction from host values goes through ``field.array`` once; all
later work (interpolation, LDE, constraint evaluation) is columnwise device
math.
"""

from __future__ import annotations

import jax.numpy as jnp


class TraceTable:
    def __init__(self, field, columns, aux_columns=None, step_size: int = 1):
        """``columns``: (K, C, n) device array or list of host columns."""
        self.field = field
        if not hasattr(columns, "shape"):
            columns = field.array(columns)
        if columns.ndim == 2:
            columns = columns[:, None, :]
        self.columns = columns
        self.aux = aux_columns  # (K, C_aux, n) or None
        self.step_size = step_size

    @classmethod
    def from_columns(cls, field, cols, step_size: int = 1):
        """``cols``: list of columns, each a list of ints/elements."""
        return cls(field, field.array([[int(v) if not hasattr(v, "value")
                                         else v.value for v in c]
                                       for c in cols]),
                   step_size=step_size)

    @property
    def num_rows(self) -> int:
        return self.columns.shape[-1]

    @property
    def num_main_columns(self) -> int:
        return self.columns.shape[1]

    @property
    def num_aux_columns(self) -> int:
        return 0 if self.aux is None else self.aux.shape[1]

    def all_columns(self):
        if self.aux is None:
            return self.columns
        return jnp.concatenate([self.columns, self.aux], axis=1)

    def to_host_columns(self):
        ints = self.field.to_ints(self.columns)
        return [[int(v) for v in col] for col in ints]
