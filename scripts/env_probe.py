#!/usr/bin/env python
"""Probe the runtime for OPTIONAL libraries the engine gates on.

The multimodal decode/resize/frame-sample operators
(``operators/multimodal.py``) and the transformWithStateInPandas streaming
operator (``streaming/events_stream.py``) ship real Spark plumbing
(schemas, Arrow batching, partitioning) but gate their library-dependent
kernels behind import probes. This script is the committed evidence for
which gates are open in the build environment: run it and compare with
ENVIRONMENT.md. No probe failure is an engine bug — each missing library
downgrades exactly one documented kernel to its stub/skip path.

Usage: python scripts/env_probe.py
"""

from __future__ import annotations

import importlib
import json
import platform
import sys

# library -> (why the engine wants it, what its absence gates)
PROBES = {
    "PIL": ("image decode/resize kernels", "operators/multimodal.py decode stubs stay NotImplementedError; q_multimodal_decode runs the deterministic fake-decode twin"),
    "cv2": ("alternate image codec", "same gate as PIL"),
    "av": ("video frame sampling (ffmpeg bindings)", "operators/multimodal.py frame-sample codec stub; q_frame_sample uses synthetic frame index math"),
    "soundfile": ("audio decode", "audio kernels unimplemented (no fixture needs them)"),
    "google.protobuf": ("transformWithStateInPandas state serialization", "streaming/events_stream.py per_type_user_counts_tws env-gated; 1 pytest skip"),
    "numpy": ("vectorized UDF kernels", "required — engine assumes present"),
    "pandas": ("Arrow batch interchange", "required — engine assumes present"),
    "pyarrow": ("Arrow transfer for pandas UDFs", "required — engine assumes present"),
    "duckdb": ("oracle parity harness", "required for tests only"),
}


def probe() -> dict:
    out = {
        "python": sys.version.split()[0],
        "platform": platform.platform(),
        "libs": {},
    }
    for mod, (want, gates) in PROBES.items():
        try:
            m = importlib.import_module(mod)
            out["libs"][mod] = {
                "present": True,
                "version": getattr(m, "__version__", None),
            }
        except ImportError:
            out["libs"][mod] = {"present": False, "wanted_for": want, "gates": gates}
    try:
        import pyspark

        out["pyspark"] = pyspark.__version__
    except ImportError:  # pragma: no cover
        out["pyspark"] = None
    return out


if __name__ == "__main__":
    print(json.dumps(probe(), indent=2))
