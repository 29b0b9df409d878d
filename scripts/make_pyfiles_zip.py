"""Build the --py-files zip for spark-submit deployments.

    python scripts/make_pyfiles_zip.py [/tmp/parser_rdf_spark.zip]

(The in-process session factory ships the same zip automatically via
addPyFile; this script exists for explicit spark-submit invocations.)
"""

from __future__ import annotations

import os
import sys
import zipfile


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/parser_rdf_spark.zip"
    pkg = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "parser_rdf_spark")
    with zipfile.ZipFile(out, "w") as z:
        for fname in sorted(os.listdir(pkg)):
            if fname.endswith(".py"):
                z.write(os.path.join(pkg, fname), arcname=f"parser_rdf_spark/{fname}")
    print(out)


if __name__ == "__main__":
    main()
