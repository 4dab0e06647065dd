"""Minimal reader for R .rda / .RData workspace files (XDR binary format).

Implements just enough of R's public serialization format ("R Internals",
section 'Serialization Formats') to load the data.frame fixtures bundled
with the reference package (hypothyroid.rda, titanic.rda) without an R
installation: gzip stream, RDX2/RDX3 magic, XDR ints/doubles, and the
SEXP types a data.frame needs (LISTSXP pairlists, SYMSXP, CHARSXP,
LGL/INT/REAL/STR/VEC vectors, attributes, the REFSXP reference table and
version-3 ALTREP compact integer sequences).

Original implementation from the public format description; no reference
code involved.
"""

from __future__ import annotations

import gzip
import struct

import numpy as np
import pandas as pd

NILSXP = 0
SYMSXP = 1
LISTSXP = 2
CHARSXP = 9
LGLSXP = 10
INTSXP = 13
REALSXP = 14
CPLXSXP = 15
STRSXP = 16
VECSXP = 19
RAWSXP = 24
ALTREP_SXP = 238
ATTRLISTSXP = 239  # not a real code; placeholder
NILVALUE_SXP = 254
REFSXP = 255
GLOBALENV_SXP = 253
EMPTYENV_SXP = 242
BASEENV_SXP = 241
MISSINGARG_SXP = 251
UNBOUNDVALUE_SXP = 249

NA_INT = -2147483648


class _Reader:
    def __init__(self, data: bytes):
        self.b = data
        self.pos = 0
        self.refs: list = []

    def _take(self, n: int) -> bytes:
        out = self.b[self.pos:self.pos + n]
        if len(out) != n:
            raise EOFError("truncated RDA stream")
        self.pos += n
        return out

    def u_int(self) -> int:
        return struct.unpack(">i", self._take(4))[0]

    def u_double(self) -> float:
        return struct.unpack(">d", self._take(8))[0]

    def u_ints(self, n: int) -> np.ndarray:
        return np.frombuffer(self._take(4 * n), dtype=">i4").astype(np.int64)

    def u_doubles(self, n: int) -> np.ndarray:
        return np.frombuffer(self._take(8 * n), dtype=">f8").astype(np.float64)

    # ------------------------------------------------------------------
    def read_item(self):
        flags = self.u_int()
        ptype = flags & 0xFF
        has_attr = bool(flags & 0x200)
        has_tag = bool(flags & 0x400)

        if ptype == NILVALUE_SXP or ptype == NILSXP:
            return None
        if ptype == REFSXP:
            idx = flags >> 8
            if idx == 0:
                idx = self.u_int()
            return self.refs[idx - 1]
        if ptype == SYMSXP:
            name = self.read_item()
            self.refs.append(name)
            return name
        if ptype in (GLOBALENV_SXP, EMPTYENV_SXP, BASEENV_SXP,
                     MISSINGARG_SXP, UNBOUNDVALUE_SXP):
            return None
        if ptype == LISTSXP:
            attr = self.read_item() if has_attr else None
            tag = self.read_item() if has_tag else None
            car = self.read_item()
            cdr = self.read_item()
            pairs = [(tag, car)]
            if isinstance(cdr, _PairList):
                pairs += cdr.pairs
            elif cdr is not None:
                pairs.append((None, cdr))
            pl = _PairList(pairs)
            pl.attr = attr
            return pl
        if ptype == CHARSXP:
            n = self.u_int()
            if n == -1:
                return None  # NA_character_
            raw = self._take(n)
            try:
                return raw.decode("utf-8")
            except UnicodeDecodeError:
                return raw.decode("latin-1")
        if ptype == LGLSXP:
            n = self.u_int()
            vals = self.u_ints(n)
            out = _RVec("logical", vals)
            out.attr = self.read_item() if has_attr else None
            return out
        if ptype == INTSXP:
            n = self.u_int()
            vals = self.u_ints(n)
            out = _RVec("integer", vals)
            out.attr = self.read_item() if has_attr else None
            return out
        if ptype == REALSXP:
            n = self.u_int()
            vals = self.u_doubles(n)
            out = _RVec("double", vals)
            out.attr = self.read_item() if has_attr else None
            return out
        if ptype == CPLXSXP:
            n = self.u_int()
            vals = self.u_doubles(2 * n)
            out = _RVec("complex", vals[0::2] + 1j * vals[1::2])
            out.attr = self.read_item() if has_attr else None
            return out
        if ptype == STRSXP:
            n = self.u_int()
            vals = [self.read_item() for _ in range(n)]
            out = _RVec("character", vals)
            out.attr = self.read_item() if has_attr else None
            return out
        if ptype == VECSXP:
            n = self.u_int()
            vals = [self.read_item() for _ in range(n)]
            out = _RVec("list", vals)
            out.attr = self.read_item() if has_attr else None
            return out
        if ptype == RAWSXP:
            n = self.u_int()
            out = _RVec("raw", self._take(n))
            out.attr = self.read_item() if has_attr else None
            return out
        if ptype == ALTREP_SXP:
            info = self.read_item()     # pairlist: (class-sym, pkg-sym, type)
            state = self.read_item()
            attr = self.read_item()
            return _expand_altrep(info, state, attr)
        raise ValueError(f"unhandled SEXP type {ptype} at offset {self.pos}")


class _PairList:
    def __init__(self, pairs):
        self.pairs = pairs
        self.attr = None

    def as_dict(self):
        return {t: v for t, v in self.pairs if t is not None}


class _RVec:
    def __init__(self, kind, values):
        self.kind = kind
        self.values = values
        self.attr = None

    def attrs(self) -> dict:
        if isinstance(self.attr, _PairList):
            return self.attr.as_dict()
        return {}


def _expand_altrep(info, state, attr):
    """Materialize the ALTREP classes a saved data.frame can contain."""
    if not isinstance(info, _PairList) or not info.pairs:
        raise ValueError("malformed ALTREP info")
    cls = info.pairs[0][1]
    if cls == "compact_intseq":
        # state: REALSXP [n, start, step]
        n, start, step = (int(state.values[0]), state.values[1],
                          state.values[2])
        out = _RVec("integer",
                    (start + step * np.arange(n)).astype(np.int64))
        out.attr = attr
        return out
    if cls == "compact_realseq":
        n, start, step = (int(state.values[0]), state.values[1],
                          state.values[2])
        out = _RVec("double", start + step * np.arange(int(n)))
        out.attr = attr
        return out
    if cls in ("wrap_integer", "wrap_real", "wrap_string", "wrap_logical"):
        payload = state.values[0] if state.kind == "list" else state
        payload.attr = payload.attr or attr
        return payload
    if cls == "deferred_string":
        raise ValueError("deferred_string ALTREP not supported")
    raise ValueError(f"unhandled ALTREP class {cls!r}")


def _rvec_to_series(v) -> pd.Series:
    at = v.attrs() if isinstance(v, _RVec) else {}
    levels = at.get("levels")
    klass = at.get("class")
    klass_vals = list(klass.values) if isinstance(klass, _RVec) else []
    if isinstance(levels, _RVec) and "factor" in klass_vals:
        codes = np.asarray(v.values, dtype=np.int64) - 1  # R codes are 1-based
        codes[np.asarray(v.values) == NA_INT] = -1
        return pd.Series(pd.Categorical.from_codes(
            codes, categories=list(levels.values),
            ordered="ordered" in klass_vals))
    if v.kind == "logical":
        vals = np.asarray(v.values)
        out = pd.Series(vals == 1, dtype=object)
        out[vals == NA_INT] = None
        return out
    if v.kind == "integer":
        vals = np.asarray(v.values, dtype=np.float64)
        vals[np.asarray(v.values) == NA_INT] = np.nan
        return pd.Series(vals)
    if v.kind == "double":
        return pd.Series(np.asarray(v.values, dtype=np.float64))
    if v.kind == "character":
        return pd.Series(v.values, dtype=object)
    raise ValueError(f"cannot convert R vector kind {v.kind}")


def _to_pandas(obj):
    if isinstance(obj, _RVec) and obj.kind == "list":
        at = obj.attrs()
        klass = at.get("class")
        names = at.get("names")
        if (isinstance(klass, _RVec) and "data.frame" in list(klass.values)
                and isinstance(names, _RVec)):
            cols = {}
            for name, col in zip(names.values, obj.values):
                cols[name] = _rvec_to_series(col)
            df = pd.DataFrame(cols)
            rn = at.get("row.names")
            if isinstance(rn, _RVec) and rn.kind == "character":
                df.index = list(rn.values)
            elif (isinstance(rn, _RVec) and rn.kind == "integer"
                  and len(rn.values) == 2
                  and np.asarray(rn.values)[0] == NA_INT):
                pass  # compact 1:n row names
            elif isinstance(rn, _RVec) and rn.kind == "integer":
                df.index = np.asarray(rn.values, dtype=np.int64)
            return df
    return obj


def read_rda(path: str) -> dict:
    """Load an .rda file -> {name: pandas.DataFrame | raw R object}."""
    with open(path, "rb") as f:
        raw = f.read()
    if raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)
    if not raw.startswith((b"RDX2\n", b"RDX3\n")):
        raise ValueError("not an RDX2/RDX3 workspace file")
    r = _Reader(raw[5:])
    fmt = r._take(2)
    if fmt != b"X\n":
        raise ValueError(f"only XDR format supported, got {fmt!r}")
    version = r.u_int()
    r.u_int()  # writer version
    r.u_int()  # min reader version
    if version >= 3:
        n = r.u_int()
        r._take(n)  # native encoding name
    top = r.read_item()
    out = {}
    if isinstance(top, _PairList):
        for tag, val in top.pairs:
            if tag is not None:
                out[tag] = _to_pandas(val)
    return out


if __name__ == "__main__":
    import sys
    for p in sys.argv[1:]:
        for name, df in read_rda(p).items():
            print(f"== {name} ==")
            if isinstance(df, pd.DataFrame):
                print(df.dtypes)
                print(df.head())
                print("rows:", len(df))
            else:
                print(type(df))
