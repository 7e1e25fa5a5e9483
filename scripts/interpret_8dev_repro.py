"""Minimal repro: Pallas TPU-interpret deadlock at 8 virtual CPU devices.

Round-4 finding while wiring the real-kernel tiled path into the
CPU-mesh dryrun (VERDICT round-3 item 4). Status matrix measured on
this image (jax 0.8.x, CPU platform, `jax_num_cpu_devices=8`):

| program                                            | 4 devices | 8 devices |
|----------------------------------------------------|-----------|-----------|
| one pallas kernel in shard_map                     | OK        | OK        |
| kernel + psum                                      | OK        | —         |
| while_loop[halo ppermute + kernel + psum]          | OK        | —         |
| while_loop[warp kernel + LK kernel + halos + psum] | OK        | OK (1)    |
| full tiled_lucas_kanade_pyramidal(backend=pallas)  | OK        | DEADLOCK  |

(1) the hand-built two-kernel equivalent of the fine-refine loop passes
at (2,2,2); the full path (which adds all_gathers + the replicated
coarse-level pallas refine under the same interpret context) deadlocks
at ANY 8-device mesh shape tried — (2,2,2), (1,2,4), identical or
divergent batch contents, convergence on or off — while the identical
program on (1,2,2)/4 devices completes and matches the single-device
pallas output to 1e-3.

Stack at deadlock (faulthandler): every device thread blocked in
jax/_src/pallas/mosaic/interpret/interpret_pallas_call.py
`_allocate_buffer` -> `np.array(val)` inside an ordered io_callback —
i.e. a callback waiting on an input value whose producing program is
itself queued behind the interpreter's global `threading.Barrier(
num_devices)` (interpret_pallas_call._initialize_shared_memory). The
interpreter requires EVERY device thread to arrive at every kernel's
barrier; once the composed program is large enough that the CPU client
doesn't run all 8 device programs far enough concurrently, the barrier
starves. Placement of `force_tpu_interpret_mode` also matters: entering
it INSIDE the shard-mapped code keeps the 4-device case reliable;
wrapping the jit call site from outside deadlocks even cases that
otherwise pass (this is why tiled_pyramidal plumbs `interpret=` down to
the kernel call sites instead of documenting an outer `with`).

Consequences for tpuflow:
- tests/test_sharding.py::test_tiled_pallas_interpret_cpu_mesh and
  __graft_entry__.dryrun_multichip exercise the REAL kernel path on a
  4-device (1, 2, 2) virtual mesh (interpret=True).
- 8-device coverage of the jnp twins is unchanged (no interpret).
- Real-TPU coverage of the pallas tiled path stays in
  scripts/tpu_fastpath_check.sh.

Run: python scripts/interpret_8dev_repro.py [n_devices]  (default 8 —
expect a hang; ctrl-C or the 120 s faulthandler dump will show the
barrier stacks. Pass 4 to see the same program complete.)

Round-5 retest (jax 0.9.0, VERDICT r4 item 8): still deadlocks at 8
devices — and the r5 tiled path no longer contains ANY all_gather for
this geometry (the distributed pyramid build shards both levels), so
the hang is not gather-related: the composed program (two pallas
kernels + ppermute halos + psum inside while_loop, per batch element)
alone starves the interpreter's global barrier once 8 device threads
contend. Upstream issue not filed from this rig (no network egress);
when filing, title it "pallas TPU interpret mode: global device
barrier starvation at >= 8 devices under shard_map composition" and
attach this script. The 4-device dryrun/test coverage stands
(tests/test_sharding.py::test_tiled_pallas_interpret_cpu_mesh).
"""

import faulthandler
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    faulthandler.dump_traceback_later(120, exit=True)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", max(n, 8))

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from tpuflow.core.config import PyramidConfig
    from tpuflow.sharding.tiled_pyramidal import tiled_lucas_kanade_pyramidal

    shape = {4: (1, 2, 2), 8: (2, 2, 2)}[n]
    devs = np.array(jax.devices()[:n]).reshape(shape)
    mesh = Mesh(devs, ("batch", "ty", "tx"))
    cfg = PyramidConfig(levels=2, iterations=2)
    rng = np.random.default_rng(0)
    b = shape[0]
    prev = jnp.asarray(rng.uniform(0, 255, (b, 80, 128)), jnp.float32)
    curr = jnp.roll(prev, 2, axis=2)

    t0 = time.time()
    print(f"running tiled pallas-interpret on {shape} mesh ...", flush=True)
    u, v = tiled_lucas_kanade_pyramidal(
        prev, curr, mesh, config=cfg, backend="pallas", interpret=True
    )
    print(f"completed in {time.time() - t0:.1f}s; |u| sum = "
          f"{float(jnp.abs(u).sum()):.2f}")


if __name__ == "__main__":
    main()
