"""One-line plan census over every declared batch key: counts of
Exchange / python-eval / SortMergeJoin / duplicated-UDF signatures.

Flags keys whose plan evaluates the SAME Python UDF expression more
than once (guide's filter-over-UDF-column duplication) and keys with
unexpected shuffles. Streaming keys execute a replay when built, so
they are skipped here (census only; bench covers one of them).
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_webhooks_spark import registry  # noqa: E402
from data_webhooks_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
SKIP_PREFIX = ("stream_", "source_", "sink_", "join_stream")


def main() -> None:
    spark = get_spark("plan-census")
    qs = registry.queries()
    only = set(sys.argv[1:])
    rows = []
    for k in sorted(qs):
        if only and k not in only:
            continue
        if not only and k.startswith(SKIP_PREFIX):
            continue
        try:
            df = qs[k](spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # noqa: BLE001
            print(f"{k}: ERROR {type(e).__name__}: {e}")
            continue
        n_exch = len(re.findall(r"\(\d+\) Exchange", text))
        n_bexch = len(re.findall(r"\(\d+\) BroadcastExchange", text))
        n_smj = len(re.findall(r"SortMergeJoin", text))
        n_cart = len(re.findall(r"Cartesian|BroadcastNestedLoop", text))
        # duplicated UDF: same "udfname(args)#id" applied at two distinct
        # ArrowEvalPython/BatchEvalPython operator ids
        evals = re.findall(r"\(\d+\) (?:Arrow|Batch)EvalPython\nInput.*\nArguments: \[([^\]]+)\]", text)
        sigs = [re.sub(r"#\d+", "", e.split("],")[0]) for e in evals]
        dup = len(sigs) - len(set(sigs)) if sigs else 0
        n_py = text.count("EvalPython") + text.count("MapInPandas") + text.count("MapInArrow") + text.count("FlatMapGroupsInPandas") + text.count("FlatMapCoGroupsInPandas")
        flags = []
        if dup:
            flags.append(f"DUP_UDF x{dup}")
        if n_cart:
            flags.append(f"NESTEDLOOP x{n_cart}")
        if n_smj:
            flags.append(f"SMJ x{n_smj}")
        rows.append((k, n_exch, n_bexch, n_py, " ".join(flags)))
        print(f"{k}: shuffles={n_exch} bcast={n_bexch} py={n_py} {' '.join(flags)}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
