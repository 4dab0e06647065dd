"""GritBot .data/.names export (B7, reference __init__.py:1069-1156).

Writes the two files the original GritBot program consumes, enabling the
same differential-testing hook the reference provides.  Works from the
frozen model schema plus a (small) pandas sample.

Format follows the GritBot reader's own rules
(gritbot_original/getnames.c:46-60): ',', ':', '.', '|' act as
delimiters, '?' is missing, and ANY character can be escaped with a
backslash — so names and values containing delimiters are
backslash-escaped here.  (The reference exporter routes .data through
pandas ``to_csv``, whose double-quote escaping GritBot does not parse;
this implementation escapes per getnames.c instead.)  Structure mirrors
the reference: row label first in .data, the redundant target line then
one declaration per column in .names, timestamps rendered as
"%Y-%m-%d %H:%M:%S", ordinals as "[ordered]", and an
"attributes excluded:" footer for ignored columns.
"""

from __future__ import annotations

import os

_SPECIAL = "\\,:.|"


def _esc(v) -> str:
    s = str(v)
    for ch in _SPECIAL:
        s = s.replace(ch, "\\" + ch)
    return s


def _fmt_value(v, info) -> str:
    if v is None or v != v:
        return "?"
    if info["kind"] == "timestamp":
        try:
            return v.strftime("%Y-%m-%d %H:%M:%S")
        except AttributeError:
            return _esc(v)
    if info["kind"] == "numeric":
        return repr(float(v))
    return _esc(v)


def generate_gritbot_files(model: dict, pdf, path: str,
                           basename: str = "spark_outliers",
                           cols_ignore: list[str] | None = None
                           ) -> tuple[str, str]:
    schema = model["schema"]
    cols = [c for c in pdf.columns if c in schema]
    ignored = [c for c in (cols_ignore or []) if c in cols]
    names_path = os.path.join(path, f"{basename}.names")
    data_path = os.path.join(path, f"{basename}.data")

    with open(names_path, "w") as f:
        if cols:
            # redundant target line, required by GritBot (reference
            # __init__.py:1122)
            f.write(f"{_esc(cols[0])}.\n\n")
        for c in cols:
            info = schema[c]
            if info["kind"] == "numeric":
                f.write(f"{_esc(c)}: continuous.\n")
            elif info["kind"] == "timestamp":
                f.write(f"{_esc(c)}: timestamp.\n")
            elif info.get("is_bool"):
                f.write(f"{_esc(c)}: True, False.\n")
            else:
                pre = "[ordered] " if info["kind"] == "ordinal" else ""
                levels = ", ".join(_esc(v) for v in info["levels"])
                f.write(f"{_esc(c)}: {pre}{levels}.\n")
        if ignored:
            f.write("\n\nattributes excluded: "
                    + ", ".join(_esc(c) for c in ignored) + ".\n")

    with open(data_path, "w") as f:
        labels = pdf.index
        for i, (_, row) in enumerate(pdf[cols].iterrows()):
            vals = [_esc(labels[i])]
            for c in cols:
                vals.append(_fmt_value(row[c], schema[c]))
            f.write(",".join(vals) + "\n")
    return names_path, data_path
