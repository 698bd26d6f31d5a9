"""One-off driver: run bench.bench_fed_train() (end-to-end fed training
throughput for the flagship, VERDICT r2 task 4) on the real chip and merge
the result into bench_extra.json under "fed_train"."""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
import bench

extra = {}
if bench.EXTRA_FILE.exists():
    extra = json.loads(bench.EXTRA_FILE.read_text())
only = sys.argv[1] if len(sys.argv) > 1 else None
if only in (None, "host"):
    extra["fed_train"] = bench.bench_fed_train()
    print(json.dumps(extra["fed_train"], indent=1), flush=True)
if only in (None, "device"):
    extra["fed_train_device_aug"] = bench.bench_fed_train(device_aug=True)
    print(json.dumps(extra["fed_train_device_aug"], indent=1), flush=True)
if only in (None, "device", "fused"):
    extra["fed_train_device_aug_fused4"] = bench.bench_fed_train(
        device_aug=True, steps_per_dispatch=4
    )
    print(json.dumps(extra["fed_train_device_aug_fused4"], indent=1),
          flush=True)
if only in (None, "shm"):
    # VERDICT r3 task #5: producer isolated in its own OS process
    # (data/shm_loader.py) — both with the host cv2 aug (where producer CPU
    # dominates) and with --device_aug (where the raw-collate producer is
    # light but still contended)
    extra["fed_train_shm"] = bench.bench_fed_train(shm=True)
    print(json.dumps(extra["fed_train_shm"], indent=1), flush=True)
if only in (None, "shm"):
    extra["fed_train_shm_device_aug"] = bench.bench_fed_train(
        shm=True, device_aug=True
    )
    print(json.dumps(extra["fed_train_shm_device_aug"], indent=1),
          flush=True)
bench.EXTRA_FILE.write_text(json.dumps(extra))
