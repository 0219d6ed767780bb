"""One-command transformWithState proof for protobuf-equipped hosts
(VERDICT r10 ask #8).

This container has no protobuf wheel and no network, so the Spark 4
``transformWithStateInPandas`` operator stays behind its documented
ImportError gate (``streaming/stateful.py``) and its pytest skips.
Any environment that DOES have protobuf (the operator's only extra
dependency: ``pip install protobuf``) can produce the recorded green
artifact with:

    python tools/run_tws_check.py

In THIS container there is one offline route (how TWS_CHECK.json was
recorded in round 13): the google-cloud-sdk image layer vendors a
pure-Python protobuf 6.32.0 at
``/usr/lib/google-cloud-sdk/platform/google_appengine``. pyspark
4.1.2's gencode is 6.33.0 — one minor ahead — so the runtime's own
documented escape hatch is needed:

    TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK=true \
    PYTHONPATH=/usr/lib/google-cloud-sdk/platform/google_appengine \
    python tools/run_tws_check.py

The artifact records the runtime path and whether the bypass was set,
so a reader can tell a vendored-runtime green from a wheel green.

which runs the gated operator end-to-end against the sf0.001 fixtures,
checks it equals the batch aggregate (the same assertion the gated
pytest makes), and writes TWS_CHECK.json at the repo root:

    {"protobuf": "<version>", "rows": N, "match": true}

Exit code 0 = green artifact written; 2 = protobuf absent (the gate
is working, nothing recorded); 1 = ran but mismatched (a real bug).
"""

from __future__ import annotations

import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF = os.environ.get("MII_TWS_SF_DIR", "/root/testdata/sf0.001")


def main() -> int:
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        print("protobuf absent: transformWithState stays gated (exit 2)")
        return 2

    from mapreduce_inverted_index_spark.session import get_spark
    from mapreduce_inverted_index_spark.streaming.stateful import (
        tws_user_type_totals,
    )

    spark = get_spark(app_name="tws-check")
    out = tws_user_type_totals(spark, SF)
    got = {
        (r.user_id, r.event_type): (round(r.total_value, 2), r.n_events)
        for r in out.collect()
    }
    ev = spark.read.parquet(f"{SF}/events.parquet")
    want: dict = {}
    for r in ev.select("user_id", "event_type", "value").collect():
        k = (r.user_id, r.event_type)
        # the operator accumulates cents fixed-point (floor(v*100+.5))
        cents, n = want.get(k, (0, 0))
        import math

        want[k] = (cents + int(math.floor(r.value * 100.0 + 0.5)), n + 1)
    want = {k: (round(c / 100.0, 2), n) for k, (c, n) in want.items()}
    match = got == want
    pb = __import__("google.protobuf", fromlist=["__version__"])
    artifact = {
        "protobuf": pb.__version__,
        "protobuf_path": os.path.dirname(pb.__file__),
        "version_check_bypassed": (
            os.getenv("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "")
        ).lower()
        == "true",
        "sf_dir": SF,
        "rows": len(got),
        "match": match,
    }
    with open(f"{REPO_ROOT}/TWS_CHECK.json", "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact))
    return 0 if match else 1


if __name__ == "__main__":
    raise SystemExit(main())
