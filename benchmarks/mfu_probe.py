"""Focused MFU probe: ONLY the wide-RealNVP bf16 train step (the VERDICT
r3 item-2 headline), one config per invocation — minimal serial compiles
for slow remote-compile tunnels.

Run: PYTHONPATH=.:/root/.axon_site python benchmarks/mfu_probe.py \
         [batch] [dim] [hidden]
"""

import json
import sys
from pathlib import Path

import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent))
import roofline  # noqa: E402

if __name__ == "__main__":
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    hd = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    r = roofline.measure_wide_train(dim=dim, hdims=(hd, hd), batch=batch,
                                    n=10, compute_dtype=jnp.bfloat16)
    print(json.dumps(r), flush=True)
