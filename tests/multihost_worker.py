"""Worker process for the multi-host CPU test (tests/test_multihost.py).

Each process owns 4 virtual CPU devices; jax.distributed links them into
one 8-device runtime and the (1, 8) time mesh spans BOTH processes, so the
overlap-save halo ppermute between time blocks 3 and 4 crosses the process
boundary (the DCN path on a real pod). A frame is planted straddling that
exact cut; exactly-once delivery with correct global starts is asserted
in-process (every process sees the replicated reduction and the
allgathered slots).

Usage: multihost_worker.py <process_id> <num_processes> <coordinator_port>
(launched by test_multihost.py with JAX_PLATFORMS=cpu and
--xla_force_host_platform_device_count=4).
"""

import functools
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])  # repo root


def main(process_id: int, num_processes: int, port: int) -> None:
    import jax

    from fun_ofdm_tpu.parallel import distributed

    distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=num_processes,
        process_id=process_id)
    assert jax.process_count() == num_processes, jax.process_count()
    assert len(jax.devices()) == 4 * num_processes

    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    from fun_ofdm_tpu.models import tx
    from fun_ofdm_tpu.parallel import stream_shard
    from fun_ofdm_tpu.rates import Rate, params_for

    mesh = distributed.global_mesh(channel=1, time=4 * num_processes)
    n_time = mesh.devices.shape[1]

    rate = Rate.RATE_1_2_BPSK
    length = 16
    frame_len = params_for(rate).frame_samples(length)  # 960

    block = 4096
    n = block * n_time
    channels = 1

    # interior frame + a frame straddling EVERY time cut, including the
    # process-boundary cut between blocks (n_time/2 - 1, n_time/2)
    starts = [100]
    starts += [t * block - frame_len // 2 for t in range(1, n_time)]
    starts = sorted(set(starts))

    rng = np.random.default_rng(7)
    payload = rng.integers(0, 256, size=length, dtype=np.uint8)
    fre, fim = tx.build_frame_p(jnp.asarray(payload), rate)
    s_re = np.zeros((channels, n), dtype=np.float32)
    s_im = np.zeros((channels, n), dtype=np.float32)
    for pos in starts:
        s_re[0, pos:pos + frame_len] = np.asarray(fre)
        s_im[0, pos:pos + frame_len] = np.asarray(fim)

    # this process's local slab: full channel rows, its half of time
    c_loc, n_loc = distributed.local_capture_shape(mesh, channels, n)
    assert (c_loc, n_loc) == (channels, n // num_processes)
    lo = process_id * n_loc
    streams = distributed.shard_host_capture(
        mesh, s_re[:, lo:lo + n_loc], s_im[:, lo:lo + n_loc])

    fn = jax.jit(functools.partial(
        stream_shard.sharded_receive, rate=rate, length=length,
        mesh=mesh, max_frames_per_block=len(starts)))
    out = fn(streams)
    jax.block_until_ready(out)

    got_starts = multihost_utils.process_allgather(
        out["starts"], tiled=True)
    got_ok = multihost_utils.process_allgather(out["crc_ok"], tiled=True)
    got = sorted(int(s) for s in got_starts[0][got_ok[0]])
    assert got == starts, f"planted {starts}, decoded {got}"
    print(f"MULTIHOST OK process={process_id} frames={len(got)}",
          flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
