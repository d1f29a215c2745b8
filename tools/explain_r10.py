"""Capture .explain("formatted") for named queries into plans/r10/.

Usage: python tools/explain_r10.py <suffix> <query> [<query> ...]
Writes plans/r10/<query>_<suffix>.txt (suffix = before|after).

The formatted plan is captured from the DataFrame the query function
returns at sf0.1 (pre-execution — the shape the optimizer chose; AQE
final plans are already summarized in PLANS.md via tools/gen_plans.py).
"""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    from etl_extractor_spark.plans.registry import all_queries
    from etl_extractor_spark.session import get_spark

    spark = get_spark(app_name="explain-r10")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    out_dir = Path(_REPO, "plans", "r10")
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = queries[name](spark, "/root/testdata/sf0.1")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        out = out_dir / f"{name}_{suffix}.txt"
        out.write_text(buf.getvalue())
        print(f"wrote {out}")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
