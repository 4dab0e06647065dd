"""GritBot .data/.names export (B7, reference __init__.py:1069-1156).

Writes the two files the original GritBot program consumes, enabling the
same differential-testing hook the reference provides.  Works from the
frozen model schema plus a (small) pandas sample.
"""

from __future__ import annotations

import os


def generate_gritbot_files(model: dict, pdf, path: str,
                           basename: str = "spark_outliers") -> tuple[str, str]:
    schema = model["schema"]
    cols = [c for c in pdf.columns if c in schema]
    names_path = os.path.join(path, f"{basename}.names")
    data_path = os.path.join(path, f"{basename}.data")

    with open(names_path, "w") as f:
        f.write(f"{cols[0]}.\n\n") if cols else f.write("")
        for c in cols:
            info = schema[c]
            if info["kind"] in ("numeric", "timestamp"):
                f.write(f"{c}: continuous.\n")
            elif info.get("is_bool"):
                f.write(f"{c}: False, True.\n")
            else:
                levels = ", ".join(str(v) for v in info["levels"])
                f.write(f"{c}: {levels}.\n")

    with open(data_path, "w") as f:
        for _, row in pdf[cols].iterrows():
            vals = []
            for c in cols:
                v = row[c]
                if v is None or v != v:
                    vals.append("?")
                else:
                    vals.append(str(v))
            f.write(",".join(vals) + "\n")
    return names_path, data_path
