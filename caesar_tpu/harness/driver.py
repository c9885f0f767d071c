"""Run driver: builds the work queue and multiplexes trajectories.

Equivalent of the reference's main.py (work queue main.py:54-79, worker pool
main.py:117-153, progress main.py:205-215), redesigned for the serving-engine
architecture: instead of `num_workers` OS processes each spawning a child
process per trajectory, trajectories are asyncio tasks bounded by a worker
semaphore, all sharing one generation backend (the engine batches them) and
one slice resource manager for eval slots.  Re-running the same command
resumes every unfinished trajectory (DONE/journal recovery), exactly like
the reference's crash-recovery contract.
"""

from __future__ import annotations

import asyncio
import os
import sys
import time
from typing import List, Optional

from caesar_tpu.config import RunConfig
from caesar_tpu.evalkit.dataset import ProblemDataset, resolve_dataset
from caesar_tpu.evalkit.sandbox import EvalSandbox
from caesar_tpu.harness.generate import Generator, make_generator
from caesar_tpu.harness.journal import TurnJournal
from caesar_tpu.harness.resources import SliceResourceManager
from caesar_tpu.harness.state_machine import TrajectoryStateMachine
from caesar_tpu.harness.transitions import get_transition
from caesar_tpu.harness.work import WorkItem


def create_work_list(dataset: ProblemDataset, config: RunConfig) -> List[WorkItem]:
    """(problem x sample) work units, sample ids 1..num_samples
    (reference create_work_queue, main.py:54-79)."""
    work: List[WorkItem] = []
    for problem_id in dataset.get_problem_ids():
        for sample_id in range(1, config.num_samples + 1):
            work.append(
                WorkItem(
                    problem_id=problem_id,
                    sample_id=sample_id,
                    problem_path=dataset.get_problem_path_by_id(problem_id),
                )
            )
    limit = getattr(config, "limit_trajectories", 0)
    if limit:
        # benchmark subsetting (tools/bench_harness.py): the sequential
        # baseline leg's per-trajectory time is constant, so its rate is
        # measured on the sweep's first N trajectories instead of hours of
        # full sweep
        work = work[: int(limit)]
    return work


def run_dir(config: RunConfig) -> str:
    return os.path.join(config.log_dir_prefix, config.run_group, config.run_name)


async def run_single_work(
    config: RunConfig,
    work: WorkItem,
    generator: Generator,
    sandbox: EvalSandbox,
    resources: SliceResourceManager,
) -> TrajectoryStateMachine:
    """Init + run one trajectory (reference
    init_and_run_single_sample_work, main.py:82-114)."""
    journal = TurnJournal(
        os.path.join(run_dir(config), work.log_path()),
        config_dict=config.to_dict(),
        verbose=config.verbose,
    )
    build_dir = os.path.join(
        config.build_dir_prefix,
        config.run_group,
        config.run_name,
        work.log_path(),
    )
    stm = TrajectoryStateMachine(
        transition=get_transition(config.transition),
        config=config,
        work=work,
        journal=journal,
        generator=generator,
        sandbox=sandbox,
        resources=resources,
        build_dir=build_dir,
    )
    await stm.run()
    return stm


async def run_all(
    config: RunConfig,
    generator: Optional[Generator] = None,
    progress_interval: float = 5.0,
) -> dict:
    """Run every trajectory of the configured sweep; returns run stats."""
    dataset = resolve_dataset(config.dataset_name)
    work_list = create_work_list(dataset, config)
    own_generator = generator is None
    if generator is None:
        generator = make_generator(config)
    sandbox = EvalSandbox(
        backend=config.eval_backend,
        timeout=config.timeout,
        profiler_timeout=config.profiler_timeout,
        pool_size=config.eval_workers if config.eval_pool else 0,
    )
    resources = SliceResourceManager(eval_slots=config.eval_workers)
    worker_sem = asyncio.Semaphore(config.num_workers)

    done_count = 0
    failed: List[str] = []
    turn_latencies: List[float] = []
    t_start = time.monotonic()

    async def worker(work: WorkItem) -> None:
        nonlocal done_count
        async with worker_sem:
            try:
                stm = await run_single_work(
                    config, work, generator, sandbox, resources
                )
                turn_latencies.extend(stm.turn_wall_s)
            except Exception as e:  # a crashed trajectory must not sink the run
                failed.append(f"{work.problem_id}/{work.sample_id}: {e!r}")
                if config.verbose:
                    import traceback

                    traceback.print_exc()
            finally:
                done_count += 1

    async def progress_reporter() -> None:
        while done_count < len(work_list):
            await asyncio.sleep(progress_interval)
            elapsed = time.monotonic() - t_start
            print(
                f"[RUN {config.run_name}] {done_count}/{len(work_list)} "
                f"trajectories finished, {resources.busy} eval slots busy, "
                f"{elapsed:.0f}s elapsed",
                file=sys.stderr,
            )

    tasks = [asyncio.create_task(worker(w)) for w in work_list]
    reporter = (
        asyncio.create_task(progress_reporter()) if progress_interval > 0 else None
    )
    try:
        await asyncio.gather(*tasks)
    finally:
        if reporter:
            reporter.cancel()
        sandbox.close()
        if own_generator:
            await generator.close()

    elapsed = time.monotonic() - t_start
    turn_latencies.sort()
    p50_turn = (
        turn_latencies[len(turn_latencies) // 2] if turn_latencies else None
    )
    stats = {
        "trajectories": len(work_list),
        "failed": failed,
        "elapsed_s": elapsed,
        "trajectories_per_hour": len(work_list) / elapsed * 3600 if elapsed else 0.0,
        "turns_completed": len(turn_latencies),
        "p50_turn_latency_s": p50_turn,
    }
    if failed:
        print(f"[RUN {config.run_name}] {len(failed)} trajectories errored:",
              file=sys.stderr)
        for f in failed[:20]:
            print(f"  {f}", file=sys.stderr)
    return stats


def main(argv: Optional[List[str]] = None) -> dict:
    """CLI entry: ``python -m caesar_tpu.main key=value ... [.preset]``."""
    config = RunConfig.from_cli(argv if argv is not None else sys.argv[1:])
    if config.verbose:
        print("Running with config:", config.to_dict())
    return asyncio.run(run_all(config))
