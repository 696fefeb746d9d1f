"""Measure device<->pinned-host DMA bandwidth on the real chip.

The round-5 remat ladder measures whether `offload:` checkpoint policies
(whisper.py _remat) beat recompute end-to-end; this probe supplies the raw
link numbers for the arithmetic. An offload policy moves, per microbatch
step, roughly 2-12 GB each way (tools/bench_remat_ladder.py case comments)
— at the measured bandwidth B GB/s that is 2/B .. 12/B seconds of DMA to
hide under a ~1.25 s step, vs ~16-60 ms of recompute matmuls it replaces.

Two paths, both timed when available:
  * jit  — an identity program whose out_shardings pins the other memory
    space (the same annotate_device_placement mechanism the in-program
    offload uses; TPU-only — the CPU backend lacks the custom call)
  * put  — jax.device_put between memory-kind shardings (works everywhere,
    includes dispatch overhead)

Usage: PYTHONPATH=/root/repo python tools/probe_host_dma.py [size_mib ...]
"""

import sys
import time

import jax
import jax.numpy as jnp


def _sharding(dev, kind):
    return jax.sharding.SingleDeviceSharding(dev, memory_kind=kind)


def _time_copies(copy_fn, src, sync_fn, reps: int, size_mib: int) -> float:
    """GiB/s over reps async copies of src, hard-synced at the end
    (block_until_ready can be lazy on remote-execution platforms —
    CLAUDE.md — so sync_fn must force a scalar read)."""
    out = copy_fn(src)  # warm
    sync_fn(out)
    t0 = time.time()
    for _ in range(reps):
        out = copy_fn(src)
    sync_fn(out)
    return reps * size_mib / 1024 / (time.time() - t0)


def probe(size_mib: int, reps: int = 8) -> None:
    dev = jax.devices()[0]
    s_dev, s_host = _sharding(dev, "device"), _sharding(dev, "pinned_host")
    n = size_mib * 2**20 // 2  # bf16 elements
    x_dev = jax.device_put(jnp.ones((n,), jnp.bfloat16), s_dev)
    x_dev.block_until_ready()
    x_host = jax.device_put(x_dev, s_host)

    import numpy as np

    def sync(buf):
        # a literal host read is a hard sync in either memory space
        # (block_until_ready can be lazy on remote-execution platforms)
        np.asarray(buf[:1])

    for path, d2h_fn, h2d_fn in (
        (
            "jit",
            lambda: jax.jit(lambda x: x, out_shardings=s_host),
            lambda: jax.jit(lambda x: x, out_shardings=s_dev),
        ),
        (
            "put",
            lambda: (lambda x: jax.device_put(x, s_host)),
            lambda: (lambda x: jax.device_put(x, s_dev)),
        ),
    ):
        try:
            d2h = _time_copies(d2h_fn(), x_dev, sync, reps, size_mib)
            h2d = _time_copies(h2d_fn(), x_host, sync, reps, size_mib)
            print(
                f"RESULT dma[{path}] size={size_mib} MiB  "
                f"d2h={d2h:.2f} GiB/s  h2d={h2d:.2f} GiB/s",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 - report and continue
            print(
                f"RESULT dma[{path}] size={size_mib} MiB FAILED "
                f"{type(e).__name__}: {e}",
                flush=True,
            )


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [64, 256, 1024]
    for s in sizes:
        probe(s)


if __name__ == "__main__":
    main()
