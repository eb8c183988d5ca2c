"""Streamed-farm lane-count A/B (round 5): bigger ping-pong groups amortize
per-dispatch fixed costs (tunnel RTT, host marshal) and feed the MXU larger
batches; the cost is more per-step tunnel bytes in flight. Runs the REAL
full-stack streamed farm at several lane counts in ONE session so the
numbers share link conditions. Usage: python scripts/diag_lanes.py [lanes...]
"""

import json
import sys
import time

sys.path.insert(0, ".")

from bench import _enable_compile_cache

_enable_compile_cache()


def main():
    lane_counts = [int(a) for a in sys.argv[1:]] or [16, 24, 32]
    from bench import bench_full_stack_streamed, measure_link

    link_mb_s, rtt = measure_link()
    print(f"link {link_mb_s} MB/s rtt {rtt} ms", flush=True)
    for lanes in lane_counts:
        t0 = time.time()
        sps, extras = bench_full_stack_streamed(
            lanes=lanes, max_steps=40, oracle=False, ab_fullres=False
        )
        print(
            json.dumps({
                "lanes": lanes,
                "steps_per_s": round(sps or 0, 1),
                "warm_s": extras.get("streamed_warmup_s"),
                "overlap": extras.get("streamed_overlapped_frac"),
                "sync_s": extras.get("streamed_t_sync_s"),
                "mb_per_step": extras.get("streamed_tunnel_mb_per_step"),
                "frac_ceiling": extras.get("streamed_frac_of_transport_ceiling"),
                "total_s": round(time.time() - t0, 1),
            }),
            flush=True,
        )


if __name__ == "__main__":
    main()
