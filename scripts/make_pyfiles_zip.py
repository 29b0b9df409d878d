"""Build the --py-files zip for spark-submit deployments.

    python scripts/make_pyfiles_zip.py [/tmp/parser_rdf_spark.zip]

Delegates to session.build_pkg_zip — the same builder the in-process
session factory ships through addPyFile, so the two artifacts can't
drift.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parser_rdf_spark.session import build_pkg_zip  # noqa: E402


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/parser_rdf_spark.zip"
    print(build_pkg_zip(out))


if __name__ == "__main__":
    main()
