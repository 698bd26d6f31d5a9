"""One-off driver: run bench.bench_fed_train() (end-to-end fed training
throughput for the flagship, VERDICT r2 task 4) on the real chip and merge
the result into bench_extra.json under "fed_train"."""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
import bench

out = bench.bench_fed_train()
extra = {}
if bench.EXTRA_FILE.exists():
    extra = json.loads(bench.EXTRA_FILE.read_text())
extra["fed_train"] = out
bench.EXTRA_FILE.write_text(json.dumps(extra))
print(json.dumps(out, indent=1))
