"""Formula/data ingestion: a lightweight model-matrix builder.

TPU-native replacement for the reference's use of R's model-frame machinery
(``stats::model.frame`` / ``model.matrix`` / ``model.response``; reference:
R/family_data_processing.R:20-36).  Accepts a pandas DataFrame (or a dict of
1-D arrays) plus an R-style formula string and produces the response vector
and a dense design matrix:

  * ``"Y ~ X1 + X2"`` — named main effects;
  * ``"Y ~ ."`` — all non-response columns (the form used throughout the
    reference docs, e.g. README.md:71);
  * ``"Y ~ X1 + X2 - 1"`` / ``"... + 0"`` — drop the intercept;
  * ``"Y ~ X1:X2"`` and ``"Y ~ X1*X2"`` — interactions / crossed expansion;
  * categorical (pandas ``category`` / object / bool) columns expand to
    treatment-coded dummies dropping the first level, like R's default
    contrasts; interaction terms expand over dummy pairs.

Arrays can also bypass formulas entirely: ``design_from_arrays`` wraps an
explicit (X, y) pair with optional column names — the natural API for the
large-scale sharded path where data never lives in a DataFrame.
"""

from __future__ import annotations

import dataclasses
from typing import Mapping, Optional, Sequence

import numpy as np

__all__ = ["Design", "build_design", "design_from_arrays"]


@dataclasses.dataclass
class Design:
    """The response + model matrix pair (analogue of the reference's
    ``extract_model_data`` return value, R/family_data_processing.R:35)."""

    X: np.ndarray  # (n, d) float64 design matrix
    y: np.ndarray  # (n,) response
    columns: list  # d column names, R-style (e.g. "(Intercept)", "X1", "a:b")
    response: str  # response column name
    formula: Optional[str] = None


def _as_column_dict(data) -> Mapping[str, np.ndarray]:
    try:  # pandas DataFrame
        import pandas as pd

        if isinstance(data, pd.DataFrame):
            return {c: data[c] for c in data.columns}
    except ImportError:  # pragma: no cover
        pass
    if isinstance(data, Mapping):
        return dict(data)
    raise TypeError(
        "data must be a pandas DataFrame or a mapping of column name -> 1-D array"
    )


def _is_categorical(col) -> bool:
    try:
        import pandas as pd

        if isinstance(col, pd.Series):
            if isinstance(col.dtype, pd.CategoricalDtype):
                return True
            if col.dtype == object or col.dtype == bool:
                return True
            return False
    except ImportError:  # pragma: no cover
        pass
    arr = np.asarray(col)
    return arr.dtype.kind in ("U", "S", "O", "b")


def _levels(col):
    try:
        import pandas as pd

        if isinstance(col, pd.Series) and isinstance(col.dtype, pd.CategoricalDtype):
            return list(col.cat.categories)
    except ImportError:  # pragma: no cover
        pass
    return sorted(set(np.asarray(col).tolist()))


def _expand_var(name, col):
    """Expand one variable into (colname, float column) pairs.

    Categorical -> treatment-coded dummies dropping the first level
    (R's default contrasts); numeric passes through."""
    if _is_categorical(col):
        levels = _levels(col)
        arr = np.asarray(col)
        return [
            (f"{name}{lvl}", (arr == lvl).astype(np.float64))
            for lvl in levels[1:]
        ]
    return [(name, np.asarray(col, dtype=np.float64))]


def _parse_terms(rhs: str, columns: Sequence[str], response: str):
    """Parse the RHS into (term strings, include_intercept)."""
    include_intercept = True
    terms: list[str] = []
    for raw in rhs.split("+"):
        raw = raw.strip()
        if not raw:
            continue
        # handle subtraction of intercept written as "x - 1"
        parts = [p.strip() for p in raw.split("-")]
        head, removed = parts[0], parts[1:]
        for r in removed:
            if r in ("1",):
                include_intercept = False
            elif r:
                raise ValueError(f"unsupported removal term '- {r}' in formula")
        if head in ("0",):
            include_intercept = False
            continue
        if head in ("1", ""):
            continue
        if head == ".":
            terms.extend(c for c in columns if c != response and c not in terms)
        elif "*" in head:
            a, b = [t.strip() for t in head.split("*", 1)]
            for t in (a, b, f"{a}:{b}"):
                if t not in terms:
                    terms.append(t)
        else:
            if head not in terms:
                terms.append(head)
    return terms, include_intercept


def build_design(formula: str, data) -> Design:
    """formula + data -> Design (reference: R/family_data_processing.R:20-36)."""
    if "~" not in formula:
        raise ValueError(f"not a formula: {formula!r} (expected 'Y ~ ...')")
    lhs, rhs = formula.split("~", 1)
    response = lhs.strip()
    cols = _as_column_dict(data)
    if response not in cols:
        raise ValueError(f"response {response!r} not found in data")
    terms, intercept = _parse_terms(rhs, list(cols.keys()), response)

    names: list[str] = []
    columns: list[np.ndarray] = []
    n = len(np.asarray(cols[response]))
    if intercept:
        names.append("(Intercept)")
        columns.append(np.ones(n))
    for term in terms:
        if ":" in term:
            a, b = [t.strip() for t in term.split(":", 1)]
            for va in (a, b):
                if va not in cols:
                    raise ValueError(f"variable {va!r} not found in data")
            for na, ca in _expand_var(a, cols[a]):
                for nb, cb in _expand_var(b, cols[b]):
                    names.append(f"{na}:{nb}")
                    columns.append(ca * cb)
        else:
            if term not in cols:
                raise ValueError(f"variable {term!r} not found in data")
            for nm, c in _expand_var(term, cols[term]):
                names.append(nm)
                columns.append(c)
    if not columns:
        raise ValueError("empty model: formula produced no columns")
    X = np.column_stack(columns)
    y = np.asarray(cols[response], dtype=np.float64)
    return Design(X=X, y=y, columns=names, response=response, formula=formula)


def design_from_arrays(X, y, columns=None, add_intercept=False) -> Design:
    """Wrap explicit arrays as a Design (the array-first API path)."""
    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64).reshape(-1)
    if X.ndim != 2:
        raise ValueError(f"X must be 2-D (n, d); got shape {X.shape}")
    if X.shape[0] != y.shape[0]:
        raise ValueError(
            f"X has {X.shape[0]} rows but y has {y.shape[0]} observations"
        )
    if add_intercept:
        X = np.column_stack([np.ones(X.shape[0]), X])
        if columns is not None:
            columns = ["(Intercept)"] + list(columns)
    if columns is None:
        columns = (
            ["(Intercept)"] + [f"X{i}" for i in range(1, X.shape[1])]
            if add_intercept
            else [f"X{i}" for i in range(1, X.shape[1] + 1)]
        )
    if len(columns) != X.shape[1]:
        raise ValueError("columns length must match X's second dimension")
    return Design(X=X, y=y, columns=list(columns), response="y", formula=None)
