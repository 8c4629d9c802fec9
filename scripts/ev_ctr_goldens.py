"""Counter goldens (verify-skill recipe): fresh-count spill format vs
expected_counts.part_0_chunk_0, and merge-only vs
expected_counts_test.counts over the pre-seeded spills."""

import shutil
import tempfile

TD = "/root/reference/test_data"

from kmertools_tpu.workloads.counter import CountComputer  # noqa: E402

d1 = tempfile.mkdtemp()
c = CountComputer(f"{TD}/reads.fq", d1, 15)
c.debug = True
c.count()
a = sorted(open(f"{d1}/temp_kmers.part_0_chunk_0").read().splitlines())
b = sorted(open(f"{TD}/expected_counts.part_0_chunk_0").read().splitlines())
assert a == b, "fresh-count spill mismatch"
d2 = tempfile.mkdtemp()
shutil.rmtree(d2)
shutil.copytree(f"{TD}/computed_counts_test", d2)
c = CountComputer(f"{TD}/reads.fq", d2, 15)
c.chunks = 2
c.n_parts = 2
c.merge(False)
a = sorted(open(f"{d2}/kmers.counts").read().splitlines())
b = sorted(open(f"{TD}/expected_counts_test.counts").read().splitlines())
assert a == b, "merge golden mismatch"
print("CTR-GOLDENS-OK")
