"""Regenerate README.md's measured-numbers block from BENCH_DETAIL.json.

The r2 and r3 advisors both caught the hand-written README kernel table
drifting from the committed measurements; this makes the block generated
(ADVICE r3 #1) and a drift gate (tests/test_docs.py) fails CI whenever the
README block differs from what this script would write.

Definition used everywhere (VERDICT r3 #10b): ``bwd/fwd`` is the
THROUGHPUT ratio — adjoint GCUPS / forward GCUPS == t_fwd / t_bwd — from
the flat-stash grad-slope decomposition recorded in BENCH_DETAIL.json.
ROOFLINE.md's direct chained-adjoint measurement is a different estimator
of the same quantity and is labeled as such there.

Usage:  python tools/update_readme_bench.py   (rewrites README.md in place)
"""

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
START = ("<!-- BENCH_TABLE_START: generated from BENCH_DETAIL.json by "
         "tools/update_readme_bench.py; edit the generator, not this "
         "block -->")
END = "<!-- BENCH_TABLE_END -->"


def _g(d, key, scale=1e-9, fmt="{:.2f}", missing="n/a"):
    v = d.get(key)
    return missing if v is None else fmt.format(v * scale)


def render(d: dict) -> str:
    ms = 1.0     # seconds stay seconds
    lines = [
        START,
        "",
        "  | measured (one v5e chip, f32; `python bench.py`) | value |",
        "  |---|---|",
        "  | WENO5 reinit forward, 256³ / 512³ | **{} / {} GCUPS** "
        "(~95% of the VPU roofline — ROOFLINE.md) |".format(
            _g(d, "reinit_fwd_256_cups"), _g(d, "reinit_fwd_512_cups")),
        "  | reinit adjoint (fused bwd kernel), 256³ | {} GCUPS — "
        "bwd/fwd {} vs the 0.24 exact-adjoint op-count bound |".format(
            _g(d, "reinit_bwd_256_cups"),
            _g(d, "bwd_over_fwd", scale=1.0)),
        "  | min/max flow forward, 256³ | {} GCUPS |".format(
            _g(d, "minmax_256_cups", fmt="{:.1f}")),
        "  | min/max adjoint, 256³ | {} GCUPS (bwd/fwd {}) |".format(
            _g(d, "minmax_bwd_256_cups", fmt="{:.1f}"),
            _g(d, "minmax_bwd_over_fwd", scale=1.0)),
        "  | narrow-band reinit speedup, 256³ sphere / flat "
        "768×128×128 | {}× / {}× |".format(
            _g(d, "narrowband_speedup_256", scale=1.0),
            _g(d, "narrowband_speedup_flat_768x128x128", scale=1.0)),
        "  | narrow-band min/max speedup, 256³ sphere / flat | {}× / {}× "
        "(fused-K kernel + zero-copy tile skipping: inactive tiles move "
        "no bytes via a ping-pong carry alias; bitwise-exact for any "
        "step size/refresh, see solvers.minmax_flow) |".format(
            _g(d, "minmax_nb_256_speedup", scale=1.0),
            _g(d, "minmax_nb_flat_speedup", scale=1.0)),
        "  | end-to-end gradient (sqrt-N checkpointed), 200-step 256³ / "
        "50-step 512³ | {} s / {} s |".format(
            _g(d, "grad200_256_seconds", scale=1.0, fmt="{:.1f}"),
            _g(d, "grad50_512_seconds", scale=1.0, fmt="{:.1f}")),
        "  | SHARDED gradient on the fused kernels (1-chip mesh), "
        "200-step 256³ | {} s ({} GCUPS) |".format(
            _g(d, "sharded_grad200_256_seconds", scale=1.0, fmt="{:.1f}"),
            _g(d, "sharded_grad200_256_cups")),
        "  | narrow-band gradient speedup, 256³ | {}× "
        "({} GCUPS) |".format(
            _g(d, "grad_nb_256_speedup", scale=1.0),
            _g(d, "grad_nb_256_cups")),
        "  | init, cube40 mesh (18k tris) @256³: culled / all-pairs | "
        "{} s / {} s (**{}×**) |".format(
            _g(d, "init_256_cube40mesh_seconds", scale=1.0, fmt="{:.1f}"),
            _g(d, "init_256_cube40mesh_allpairs_seconds", scale=1.0,
               fmt="{:.0f}"),
            _g(d, "init_256_cube40mesh_speedup", scale=1.0,
               fmt="{:.0f}")),
        "  | sharded-layer overhead on 1 chip (persistent padded carry) "
        "| {}× |".format(
            _g(d, "sharded_1chip_overhead", scale=1.0)),
        "  | exchange/compute-overlap structure overhead, 256³ | {}× "
        "|".format(_g(d, "overlap_overhead_256", scale=1.0)),
        "  | serving vmap-vs-sequential speedup, 64³/96³/128³ | "
        "{}× / {}× / {}× (auto-router crossover ≈128³) |".format(
            _g(d, "serving_64_vmap_speedup", scale=1.0),
            _g(d, "serving_96_vmap_speedup", scale=1.0),
            _g(d, "serving_128_vmap_speedup", scale=1.0)),
        "  | PACKED serving (B geometries along x, ONE fused launch/step) "
        "vs best other strategy, 64³/96³/128³ | {}× / {}× / {}× "
        "({} / {} / {} geoms/s; the auto router now picks packed whenever "
        "the kernel applies) |".format(
            _g(d, "serving_64_packed_speedup", scale=1.0),
            _g(d, "serving_96_packed_speedup", scale=1.0),
            _g(d, "serving_128_packed_speedup", scale=1.0),
            _g(d, "serving_64_packed_gps", scale=1.0, fmt="{:.0f}"),
            _g(d, "serving_96_packed_gps", scale=1.0, fmt="{:.0f}"),
            _g(d, "serving_128_packed_gps", scale=1.0, fmt="{:.0f}")),
        "  | BANDED sharded gradient, 200-step 256³ | {} s ({}× vs dense "
        "sharded) |".format(
            _g(d, "sharded_grad_nb_256_seconds", scale=1.0, fmt="{:.1f}"),
            _g(d, "sharded_grad_nb_256_speedup", scale=1.0)),
        "  | END-TO-END pixels→vertices grad (config-5 chain), 256³ | "
        "{} s (init fwd {} s dominates; reinit {} + min/max {} + render "
        "{} s) |".format(
            _g(d, "e2e_pixgrad_256_seconds", scale=1.0, fmt="{:.1f}"),
            _g(d, "e2e_256_stage_init_fwd_seconds", scale=1.0,
               fmt="{:.1f}"),
            _g(d, "e2e_256_stage_reinit_fwd_seconds", scale=1.0),
            _g(d, "e2e_256_stage_minmax_fwd_seconds", scale=1.0),
            _g(d, "e2e_256_stage_render_fwd_seconds", scale=1.0)),
        "  | node advection (1000 iters, cube40 nodes @256³) / render "
        "256² | {} s / {} s |".format(
            _g(d, "advect_1000iter_256_seconds", scale=1.0),
            _g(d, "render_256x256_at_256grid_seconds", scale=1.0)),
        "",
        "  GCUPS = 1e9 cell-updates/s.  **bwd/fwd is the THROUGHPUT "
        "ratio** (adjoint GCUPS / forward GCUPS = t_fwd/t_bwd), measured "
        "by the flat-stash grad-slope decomposition; ROOFLINE.md's "
        "direct chained-adjoint measurement is a second estimator of the "
        "same quantity (0.20–0.25 across sessions on the shared tunneled "
        "chip).  Full numbers: BENCH_DETAIL.json.",
        END,
    ]
    return "\n".join(lines)


def main() -> int:
    with open(os.path.join(ROOT, "BENCH_DETAIL.json")) as f:
        detail = json.load(f)
    path = os.path.join(ROOT, "README.md")
    with open(path) as f:
        text = f.read()
    if START not in text or END not in text:
        sys.exit("README.md is missing the BENCH_TABLE markers")
    pre = text[:text.index(START)]
    post = text[text.index(END) + len(END):]
    with open(path, "w") as f:
        f.write(pre + render(detail) + post)
    print("README.md bench block regenerated")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
