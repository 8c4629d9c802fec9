"""Coverage golden (library-level: k=4/bin_size=2/bin_count=3 is outside
the CLI ranges) + CLI smoke with in-range params."""

import os
import subprocess
import sys
import tempfile

TD = "/root/reference/test_data"

from kmertools_tpu.workloads.coverage import CovComputer  # noqa: E402

d = tempfile.mkdtemp()
cov = CovComputer(f"{TD}/reads.fq", d, 4, 2, 3)
cov.build_table()
cov.compute_coverages()
got = open(f"{d}/kmers.vectors", "rb").read()
want = open(f"{TD}/expected_counts.vectors", "rb").read()
assert got == want, "cov golden mismatch"
print("COV-GOLDEN-OK")

d2 = tempfile.mkdtemp()
subprocess.run(
    [sys.executable, "-m", "kmertools_tpu", "cov", "-i", f"{TD}/reads.fq",
     "-o", d2, "-k", "15", "--bin-size", "5", "--bin-count", "16"],
    check=True,
)
lines = open(os.path.join(d2, "kmers.vectors")).read().splitlines()
assert lines and all(len(ln.split()) == 16 for ln in lines)
print("COV-CLI-OK")
