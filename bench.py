"""Benchmark: ANI-2x energy+forces on periodic water boxes, on the real chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "us/step", "vs_baseline": N}

The headline metric is the BASELINE.md north star: ANI-2x force evaluation on
a 26k-atom solvated box, target < 2 ms/step on one TPU chip (the reference
publishes no numbers of its own — BASELINE.md). vs_baseline is
target_us / measured_us, so > 1.0 beats the target.

Measurement methodology: production MD runs the whole trajectory inside one
jitted ``lax.scan`` (no per-step host dispatch — this chip sits behind a
network tunnel whose per-call latency would otherwise dominate). The bench
therefore times a scanned loop of FULL force steps — cell-list rebuild + AEV +
ensemble NN + forces, positions nudged along the forces every iteration so
steps stay data-dependent — and divides by the step count.
"""
import argparse
import json
import sys
import time


def _enable_compile_cache():
    import jax
    try:
        jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass   # older jax: cache is an optimization only


def build_scan_bench(num_molecules: int, steps_per_call: int,
                     skin: float = 0.0, refresh_every: int = 1,
                     aev_impl: str = 'pallas', nn_dtype=None,
                     nn_impl: str = 'xla', radial_impl=None):
    import jax
    import jax.numpy as jnp
    from nnpops_tpu.config import ANIBasis
    from nnpops_tpu.models.ani import ANIModel, init_ani_params
    from nnpops_tpu.neighbors.cell_list import CellList
    from nnpops_tpu.utils.water import make_water_box

    water = make_water_box(num_molecules, seed=0)
    basis = ANIBasis.ani2x()
    model = ANIModel.from_atomic_numbers(water.atomic_numbers, basis,
                                         nn_dtype=nn_dtype, nn_impl=nn_impl)
    # Size the static per-species lane capacities from the actual
    # configuration (true max neighbor counts + headroom, not guesses).
    model = model.with_blocked_layout(water.positions, water.box,
                                      margin=1.15, impl=aev_impl, skin=skin,
                                      radial_impl=radial_impl)
    params = init_ani_params(jax.random.PRNGKey(0), basis)
    box = jnp.asarray(water.box)
    # Verlet skin: the selection (cell assignment + per-species compaction +
    # frozen angular sub-list) is refreshed every `refresh_every` steps and
    # reused in between — the standard MD amortization.
    cell_list = model.create_cell_list(water.box, skin=skin)
    blocks = max(1, steps_per_call // refresh_every)

    @jax.jit
    def run(params, positions):
        def block(pos, _):
            sel = model.select(pos, box, cell_list)

            def step(pos, _):
                e, f = model.energy_and_forces_from_selection(
                    params, pos, box, cell_list, sel)
                # Nudge along the forces: keeps every step data-dependent
                # (no CSE) and mimics an integrator update without noise.
                return pos + 1e-6 * f, e
            pos, energies = jax.lax.scan(step, pos, None, length=refresh_every)
            return pos, energies
        final, energies = jax.lax.scan(block, positions, None, length=blocks)
        return final, energies

    def check_overflow(positions):
        # Consume the soft-failure overflow contract between scanned calls
        # (SURVEY §7.3): raises if any static capacity was exceeded.
        model.check_overflow(positions, box, cell_list)

    return (run, params, jnp.asarray(water.positions),
            blocks * refresh_every, check_overflow, model)


def composition_model(model, num_atoms: int, refresh: int, measured_us: float):
    """Analytic per-step work model of the window pipeline + achieved-vs-peak
    utilization (VERDICT r3 item 7).

    Work terms are derived from the ACTUAL planned layout (cell grid,
    occupancy buckets, angular row tiers, ensemble dims), costed with
    MEASURED per-unit rates (window radial ~90 elem-ops fwd + ~120 bwd per
    packed candidate slot; angular ~1290 VPU-equivalent ops per triple slot
    fwd+bwd — calibrated against the round-4 probe_r3b per-tier kernel
    timings, 6.3 ms over 9.78 M triple slots at 26k, per-tier rates
    947/1269/1434 (the old ~130 figure modeled fwd arithmetic only and was
    ~10x under the measured kernels — VERDICT r4 weak #3); row gathers at
    the measured ~4.5 ns/row latency wall; the fused ensemble at the
    measured f32-equivalent MXU rate). "Peak" is the chip's MEASURED
    sustained rate on this op class (VPU ~2e12 elem-ops/s on wide rows; MXU
    ~43e12 FLOP/s f32 — NOTES_PERF round-2/3), so utilization ~1.0 means at
    the practical speed of light for that term.
    """
    import numpy as np
    from nnpops_tpu.neighbors.window import _num_triples
    lay = model.blocked_layout
    VPU = 2.0e12          # elem-ops/s, measured sustained (wide rows)
    # Ensemble matmul rate: the fused bf16 kernel sustains ~197e12 (v5e
    # nominal bf16 peak; measured 383 GFLOP in 1.9 ms = 200e12 at 26k);
    # the f32 einsum path measured 43e12.
    MXU = 197.0e12 if model.nn_dtype is not None else 43.0e12
    # Angular payload data movement, calibrated round 5 (probe_glue /
    # probe_mirror): the forward tier gather runs 2.3 ns/row (26k: 716k
    # rows in 1.65 ms) and the sort-mirror adjoint's one 4-array lax.sort
    # costs ~3.1 ns/entry (measured ~2.2 ms) — the old single 4.5 ns
    # both-ways figure modeled the retired gather-mirror adjoint.
    GROW = (2.3 + 3.1) / 2 * 1e-9   # s/row avg over (fwd, adjoint)

    comp = {}
    vpu_ops = 0.0
    gather_rows = 0.0
    # --- window radial: packed candidate slots x (90 fwd + 120 bwd) ops.
    if lay is not None and lay.cell_caps and lay.cell_grid:
        ncells = int(np.prod(lay.cell_grid))
        c_full = -(-sum(lay.cell_caps) // 8) * 8
        kk = 27 * sum(lay.cell_caps)
        if lay.small_caps is not None and lay.num_big_cells is not None:
            c_small = -(-sum(lay.small_caps) // 8) * 8
            nb = lay.num_big_cells
            rows = nb * c_full + (ncells - nb) * c_small
        else:
            rows = ncells * c_full
        rad_slots = rows * kk
        rad_ops = rad_slots * 210.0
        vpu_ops += rad_ops
        comp['radial_slots_M'] = round(rad_slots / 1e6, 1)
        comp['radial_model_ms'] = round(rad_ops / VPU * 1e3, 2)
    # --- angular tiers: triple slots x ~130 ops + payload gather rows.
    if lay is not None and lay.ang_tier_rows is not None:
        caps_all = (lay.ang_caps,) + tuple(lay.ang_tier_caps)
        g = model.grouping
        present_counts = [g.counts[s] for s in lay.present]
        planned = [list(r) for r in lay.ang_tier_rows]
        planned.append([pc - sum(r[i] for r in planned)
                        for i, pc in enumerate(present_counts)])
        tri_ops = 0.0
        for caps_t, rows_t in zip(caps_all, planned):
            tri_ops += sum(rows_t) * _num_triples(caps_t) * 1290.0
            gather_rows += sum(rows_t) * sum(caps_t) * 2.0   # fwd + mirror
        vpu_ops += tri_ops
        comp['angular_triple_ops_G'] = round(tri_ops / 1290.0 / 1e9, 3)
        comp['angular_model_ms'] = round(tri_ops / VPU * 1e3, 2)
        comp['gather_rows_M'] = round(gather_rows / 1e6, 2)
        comp['gather_model_ms'] = round(gather_rows * GROW * 1e3, 2)
    # --- ensemble NN: fwd + input-grad ~ 3x fwd FLOPs, per-species dims
    # weighted by the actual species population.
    from nnpops_tpu.config import ANI2X_LAYER_DIMS
    g = model.grouping
    aev_len = model.basis.aev_length
    nn_flops = 0.0
    for s, cnt in enumerate(g.counts):
        if cnt == 0 or s >= len(ANI2X_LAYER_DIMS):
            continue
        d = (aev_len,) + tuple(ANI2X_LAYER_DIMS[s]) + (1,)
        nn_flops += cnt * sum(2 * a * b for a, b in zip(d, d[1:]))
    nn_flops *= 8 * 3.0
    comp['nn_model_ms'] = round(nn_flops / MXU * 1e3, 2)
    model_ms = (vpu_ops / VPU + gather_rows * GROW) * 1e3 + nn_flops / MXU * 1e3
    comp['model_total_ms'] = round(model_ms, 2)
    comp['measured_ms'] = round(measured_us / 1e3, 2)
    util = {
        # fraction of the step the work model accounts for at measured-peak
        # rates; the remainder is select (amortized /refresh), glue, and
        # efficiency losses inside the kernels.
        'model_over_measured': round(model_ms / (measured_us / 1e3), 3),
        'vpu_eff_gops_per_s': round(vpu_ops / (measured_us * 1e-6) / 1e9, 1),
        'vpu_utilization': round(vpu_ops / (measured_us * 1e-6) / VPU, 3),
        'mxu_utilization': round(nn_flops / (measured_us * 1e-6) / MXU, 3),
    }
    return comp, util


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--molecules', type=int, default=None,
                        help='override the water box size (molecules)')
    parser.add_argument('--steps', type=int, default=20,
                        help='force steps per jitted scan call')
    parser.add_argument('--calls', type=int, default=3)
    parser.add_argument('--impl', default='window',
                        choices=['window', 'pallas', 'blocked', 'payload'],
                        help='AEV implementation (window = dense per-cell '
                             'radial kernel + fused angular kernel; pallas = '
                             'compacted-lane fused kernels)')
    parser.add_argument('--nn-dtype', default='bfloat16',
                        choices=['float32', 'bfloat16'],
                        help='ensemble matmul/activation dtype. bfloat16 '
                             '(default) keeps f32 accumulation; its ~1e-3 '
                             'relative force error is inside the reference '
                             'acceptance gate of 5e-3 '
                             '(TestSymmetryFunctions.py:66-70). '
                             'Use float32 for the strict-parity path.')
    parser.add_argument('--nn-impl', default='fused',
                        choices=['xla', 'fused'],
                        help='ensemble implementation: fused (default) = '
                             'Pallas kernel with VMEM-resident weights '
                             '(inference + position gradients, the '
                             'reference BatchedNN scope); xla = einsum path '
                             'with full weight gradients')
    parser.add_argument('--radial-impl', default=None,
                        choices=['window', 'cluster'],
                        help='radial AEV kernel under --impl window: '
                             'cluster = species-pure 8-atom cluster pairs '
                             'with exact j-lists; default = dense 27-cell '
                             'window kernel')
    parser.add_argument('--skin', type=float, default=0.25,
                        help='Verlet skin (A); selection refreshed every '
                             '--refresh steps instead of every step')
    parser.add_argument('--refresh', type=int, default=8,
                        help='steps between selection refreshes. Valid while '
                             'no atom moves more than skin/2 = 0.125 A; at '
                             '300 K water H atoms move ~0.002 A per 1 fs '
                             'step (v_rms ~ 1.6 A/ps), so 8 steps keeps '
                             '>5x margin. Round-5 sweep (NOTES_PERF): '
                             '(0.25, 8) = 20.8 ms beats (0.25, 6) = 21.4 '
                             'and every larger-skin point — growing the '
                             'skin inflates the dense radial window and '
                             'angular caps by ~2 ms, dwarfing the extra '
                             'amortization.')
    args = parser.parse_args()

    import jax
    _enable_compile_cache()
    target_us = 2000.0   # BASELINE.md: < 2 ms/step at 26k atoms

    # The headline metric is the BASELINE.md north-star workload: the
    # 26k-atom box (8670 molecules). The 2.6k box is ALSO measured every
    # run so rounds stay comparable on the small box. The 2.6k box runs
    # FIRST: it compiles in seconds, so its line lands in the artifact
    # even if a driver time budget kills the run mid-26k-compile
    # (round 4 ran 26k first and lost the 2.6k metric to rc=124).
    if args.molecules:
        candidates = [(args.molecules, f'ani2x_energy_forces_us_per_step_'
                       f'{args.molecules * 3}atom_water')]
    else:
        candidates = [
            (867, 'ani2x_energy_forces_us_per_step_2.6k_water'),
            (8670, 'ani2x_energy_forces_us_per_step_26k_water'),
        ]

    config = {'impl': args.impl, 'nn_impl': args.nn_impl,
              'nn_dtype': args.nn_dtype, 'skin': args.skin,
              'refresh': args.refresh}
    succeeded = 0
    for num_mol, metric in candidates:
        try:
            (run, params, positions, true_steps, check_overflow,
             model_for_comp) = build_scan_bench(num_mol, args.steps,
                                                skin=args.skin,
                                                refresh_every=args.refresh,
                                                aev_impl=args.impl,
                                                nn_dtype=args.nn_dtype,
                                                nn_impl=args.nn_impl,
                                                radial_impl=args.radial_impl)
            final, energies = run(params, positions)       # compile + warmup
            jax.block_until_ready(final)
            check_overflow(final)   # overflow contract: between scanned calls
            t0 = time.perf_counter()
            for _ in range(args.calls):
                final, energies = run(params, positions)
            jax.block_until_ready(final)
            us = (time.perf_counter() - t0) / (args.calls * true_steps) * 1e6
            check_overflow(final)
            line = {'metric': metric, 'value': round(us, 1),
                    'unit': 'us/step', 'vs_baseline': round(target_us / us, 4),
                    'config': config}
            try:
                comp, util = composition_model(model_for_comp, num_mol * 3,
                                               args.refresh, us)
                line['composition'] = comp
                line['utilization'] = util
            except Exception as e:
                print(f'composition model failed: {e}', file=sys.stderr)
            print(json.dumps(line))
            succeeded += 1
        except Exception as e:
            print(f'bench {metric} failed: {type(e).__name__}: {e}',
                  file=sys.stderr)
    if not succeeded:
        sys.exit(1)


if __name__ == '__main__':
    main()
