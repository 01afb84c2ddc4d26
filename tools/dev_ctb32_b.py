"""Dev check: ctb32 device B kernel vs the numpy spec (CPU, byte-exact)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))
import cpu_force  # noqa: F401,E402  (must be first: keeps axon off)

import numpy as np  # noqa: E402

from generate_test_videos import synth_frame_kind  # noqa: E402
from hevc_tpu.encoder.ctb32_ref import Ctb32RefEncoder, \
    make_ctb32_config  # noqa: E402
from hevc_tpu.encoder.gop32 import Ctb32DeviceEncoder  # noqa: E402

W, H, QP, F = 64, 64, 27, 5
kind = sys.argv[1] if len(sys.argv) > 1 else "mixed"
frames = [tuple(np.asarray(p, np.int32)
                for p in synth_frame_kind(W, H, t, kind))
          for t in range(F)]
cfg = make_ctb32_config(width=W, height=H, qp=QP, inter=True, bframes=True)
sn, rn = Ctb32RefEncoder(cfg).encode_video(frames, gop=0)
print("numpy bytes:", len(sn), flush=True)
sd, rd = Ctb32DeviceEncoder(cfg).encode_video(frames, gop=0)
print("device bytes:", len(sd), flush=True)
for i, (a, b) in enumerate(zip(rn, rd)):
    for k in ("y", "cb", "cr"):
        if not np.array_equal(a[k], b[k]):
            d = np.argwhere(a[k] != b[k])
            print(f"frame {i} plane {k} differs at {d[:5]}"
                  f" n={len(d)}", flush=True)
assert sn == sd, "streams differ"
print("OK: ctb32 device B == numpy, byte-identical")
