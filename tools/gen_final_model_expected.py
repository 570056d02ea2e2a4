"""Regenerate the committed final-model golden parquet.

Run ONLY after an intended behavior change to the composed-model
kernels, then review the diff of the regenerated file and bump
FINAL_MODEL_ORACLE_VERSION in plans/kg_gate.py if the contents
changed. The driver gate (kg_final_model_triples) compares the
distributed run against this committed file; the in-process
re-derivation test (tests/test_final_model.py) keeps the file honest
against the kernels.

Usage: python tools/gen_final_model_expected.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from remediner_spark.plans.kg_gate import (
        derive_final_model_expected,
        final_model_expected_path,
    )

    exp = derive_final_model_expected()
    path = final_model_expected_path()
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    exp.to_parquet(tmp, index=False)
    os.replace(tmp, path)
    print(f"wrote {len(exp)} expected triples -> {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
