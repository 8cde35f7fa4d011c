"""One-process TPU session: full bench (integrate parity gate + perf) then
the coloration kernel probe/parity/bench. Single process because
back-to-back JAX processes stall this rig's tunnel (see CLAUDE.md)."""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")


def main():
    print("== [1/2] full bench (integrate parity + perf) ==", flush=True)
    import bench

    rc1 = bench.main()

    print("== [2/2] coloration kernel probe + parity + bench ==", flush=True)
    import tpu_coloration_bench

    rc2 = tpu_coloration_bench.main()
    return rc1 or rc2


if __name__ == "__main__":
    raise SystemExit(main())
