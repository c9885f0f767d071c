"""The per-trajectory state machine: the heart of the harness.

Drives one (problem, sample) trajectory for up to max_k turns through
START -> GENERATE -> COMPILE -> CORRECTNESS -> PERFORMANCE -> FINISH, with
next-state = transition[outcome] — the same workflow the reference's
CaesarStateMachine runs (state_machine.py:28-464), redesigned as an asyncio
task: GENERATE awaits the serving engine (hundreds of trajectories share one
decode loop), eval states run the sandbox in worker threads gated by the
slice resource manager's eval slots.

Recovery semantics match the reference exactly (state_machine.py:70-158):
DONE short-circuits the whole run; a partial log.json is replayed turn by
turn, truncated at the first missing/corrupted turn (empty prompt, response,
or kernel), and the all-turns-present-but-no-DONE case jumps straight to
FINISH to re-write the final state and the sentinel.
"""

from __future__ import annotations

import asyncio
import time
from typing import Optional

from caesar_tpu.config import RunConfig
from caesar_tpu.evalkit.result import KernelExecResult
from caesar_tpu.evalkit.sandbox import EvalSandbox
from caesar_tpu.harness.codeblocks import extract_last_code
from caesar_tpu.harness.context import build_prompt_for_turn
from caesar_tpu.harness.generate import GenerateRequest, Generator
from caesar_tpu.harness.journal import TurnJournal
from caesar_tpu.harness.resources import SliceResourceManager
from caesar_tpu.harness.states import Outcome, TrajectoryState
from caesar_tpu.harness.transitions import Transition
from caesar_tpu.harness.turn_info import TrajectoryInfo
from caesar_tpu.harness.work import WorkItem


class TrajectoryStateMachine:
    def __init__(
        self,
        transition: Transition,
        config: RunConfig,
        work: WorkItem,
        journal: TurnJournal,
        generator: Generator,
        sandbox: EvalSandbox,
        resources: SliceResourceManager,
        build_dir: str = "",
    ):
        self.transition = transition
        self.config = config
        self.work = work
        self.journal = journal
        self.generator = generator
        self.sandbox = sandbox
        self.resources = resources
        self.build_dir = build_dir

        self.state = TrajectoryState.START
        self.outcome: Optional[Outcome] = None
        self.current_k = 1
        self.max_k = config.max_k

        with open(work.problem_path, "r") as f:
            self.ref_problem_src = f.read()

        self.curr_prompt = ""
        self.info = TrajectoryInfo()
        #: wall seconds per completed turn (p50 turn latency is a headline
        #: metric, BASELINE.md targets)
        self.turn_wall_s: list = []
        self._turn_t0: Optional[float] = None

        # DONE short-circuit (reference state_machine.py:70-75)
        if self.journal.is_done():
            self.finished = True
            return
        self.finished = False

        # partial-log recovery (reference state_machine.py:77-83)
        if self.journal.log_file.exists():
            self._recover()

    # ------------------------------------------------------------------
    def _recover(self) -> None:
        """Replay the journal; truncate at the first incomplete turn
        (reference load_from_previous_run, state_machine.py:91-158)."""
        self.journal.load()
        saved = dict(self.journal.current_log)
        self.journal.clean()

        for turn in range(1, self.max_k + 2):
            self.current_k = turn
            if turn not in saved:
                break
            self.info.update_turn_data(turn, saved[turn])
            if not self.info.turns[turn].complete:
                break
            self.journal.update_turn(turn, self.info)
        else:
            # loop exhausted: all max_k+1 probes found data — can't happen
            # since log never holds max_k+1 complete turns, but keep parity
            pass

        # persist the truncation so later garbage is discarded
        # (reference state_machine.py:145)
        self.journal.save()

        # all turns complete but DONE missing: jump to FINISH to re-run the
        # final bookkeeping (reference state_machine.py:147-151)
        if self.current_k == self.max_k + 1:
            self.current_k -= 1
            # drop the (complete) last turn's replay guard: FINISH will
            # re-write it and the DONE sentinel
            self.state = TrajectoryState.FINISH
        if self.config.verbose:
            print(
                f"[RECOVER {self.work.problem_id}/{self.work.sample_id}] "
                f"resuming from turn {self.current_k}"
            )

    # ------------------------------------------------------------------
    async def run(self) -> None:
        if self.finished:
            return
        while self.current_k <= self.max_k:
            if self.config.show_state:
                print(
                    f"[STM {self.work.problem_id}/{self.work.sample_id}] "
                    f"turn {self.current_k}, state {self.state.name}"
                )
            handler = {
                TrajectoryState.START: self._start,
                TrajectoryState.GENERATE: self._generate,
                TrajectoryState.COMPILE: self._compile,
                TrajectoryState.CORRECTNESS: self._correctness,
                TrajectoryState.PERFORMANCE: self._performance,
                TrajectoryState.FINISH: self._finish,
            }.get(self.state)
            if handler is None:
                raise ValueError(f"Invalid state: {self.state}")
            await handler()
            self.state = self.transition[self.outcome]

    # ------------------------------------------------------------------
    async def _start(self) -> None:
        """Rebuild this turn's prompt from everything so far (reference
        start_turn_logic, state_machine.py:200-218)."""
        self.curr_prompt = build_prompt_for_turn(
            turn=self.current_k,
            ref_arch_src=self.ref_problem_src,
            kernels=self.info.kernel_code,
            eval_result=self.info.eval_result,
            profiler_result=self.info.profiler_result,
            strategy=self.config.prompt_strategy,
            max_profiler_chars=self.config.max_profiler_feedback_chars,
            pack=self.config.prompt_flavor,
            context_mode=self.config.context_mode,
        )
        self.info.prompt[self.current_k] = self.curr_prompt
        self._turn_t0 = time.monotonic()
        self.outcome = Outcome.Start

    def _reasoning_min_tokens(self) -> int:
        """Map the reasoning-model knobs onto the engine's EOS-deferral
        budget (min_tokens): the in-house equivalent of the reference's
        per-provider budget_tokens pass-through (query_server contract,
        reference state_machine.py:238-241, caesar_config.py:32-35).

        reasoning_budget_tokens wins when set; otherwise reasoning_effort
        names a fraction of max_tokens.  Non-reasoning runs keep the
        default floor of 1."""
        if not self.config.reasoning_model:
            return 1
        budget = self.config.reasoning_budget_tokens
        if not budget:
            frac = {"low": 8, "medium": 4, "high": 2}.get(
                self.config.reasoning_effort, 4
            )
            budget = self.config.max_tokens // frac
        # never force EOS deferral past the decode cap
        return max(1, min(budget, self.config.max_tokens - 1))

    async def _generate(self) -> None:
        """Await the generation backend (reference generate_logic,
        state_machine.py:220-264 — there a blocking HTTP query_server)."""
        request = GenerateRequest(
            prompt=self.curr_prompt,
            temperature=(
                0.0 if self.config.greedy_sample else self.config.temperature
            ),
            top_p=self.config.top_p,
            top_k=self.config.top_k,
            max_tokens=self.config.max_tokens,
            min_tokens=self._reasoning_min_tokens(),
            reasoning_effort=(
                self.config.reasoning_effort
                if self.config.reasoning_model
                else ""
            ),
            seed=self.config.engine.seed + self.work.sample_id,
            trajectory_id=f"{self.work.problem_id}/{self.work.sample_id}",
        )
        result = await self.generator.generate(request)
        self.info.model_response[self.current_k] = result.text
        self.info.token_usage[self.current_k] = result.token_usage

        kernel_code = extract_last_code(result.text, ["python", "cpp"])
        if kernel_code is None or len(kernel_code) == 0:
            self.outcome = Outcome.GenerateFail
        else:
            self.info.kernel_code[self.current_k] = kernel_code
            self.outcome = Outcome.GenerateSuccess

    async def _compile(self) -> None:
        """Compile-check in the sandbox (reference compile_logic,
        state_machine.py:266-306)."""
        async with self.resources.reserve_eval_slot():
            returncode, stdout, err = await asyncio.to_thread(
                self.sandbox.compile,
                self.info.kernel_code[self.current_k],
                self.ref_problem_src,
                self.build_dir,
            )
        if returncode == 0:
            # partial result; correctness fills in the rest
            self.info.eval_result[self.current_k] = KernelExecResult(
                compiled=True,
                metadata={"hardware": self.sandbox.backend, "device": "compile"},
            )
            self.outcome = Outcome.CompileSuccess
        else:
            self.info.eval_result[self.current_k] = KernelExecResult(
                compiled=False,
                correctness=False,
                metadata={
                    "compiler_error": (
                        f"Compilation failed.\nstdout: {stdout}\nstderr: {err}"
                    ),
                    "hardware": self.sandbox.backend,
                    "device": "compile",
                },
            )
            self.outcome = Outcome.CompileFail

    async def _correctness(self) -> None:
        """Correctness + timing in the sandbox (reference
        correctness_check_logic, state_machine.py:308-390; the sandbox
        subprocess provides the process/device isolation and timeout the
        reference built from mp.Process + join(timeout))."""
        async with self.resources.reserve_eval_slot():
            t0 = time.monotonic()
            result = await asyncio.to_thread(
                self.sandbox.evaluate,
                self.ref_problem_src,
                self.info.kernel_code[self.current_k],
                self.config.num_correct_trials,
                self.config.num_perf_trials,
                self.config.measure_performance,
                self.build_dir,
            )
            elapsed = time.monotonic() - t0
        self.info.eval_result[self.current_k] = result
        if result is not None and result.compiled and result.correctness:
            self.outcome = Outcome.CorrectnessSuccess
        else:
            self.outcome = Outcome.CorrectnessFail
        if self.config.verbose:
            print(
                f"[CORRECTNESS {self.work.problem_id}/{self.work.sample_id}] "
                f"{elapsed:.2f}s -> {self.outcome.name}"
            )

    async def _performance(self) -> None:
        """Profile the correct kernel (reference performance_logic,
        state_machine.py:392-438 — bounded by profiler_timeout here where
        the reference waited forever)."""
        async with self.resources.reserve_eval_slot():
            table = await asyncio.to_thread(
                self.sandbox.profile,
                self.ref_problem_src,
                self.info.kernel_code[self.current_k],
                self.build_dir,
            )
        self.info.profiler_result[self.current_k] = table
        self.outcome = Outcome.Performance

    async def _finish(self) -> None:
        """Persist the turn; advance; DONE after the last turn (reference
        finish_turn_logic, state_machine.py:440-464)."""
        self.journal.update_turn_and_save(self.current_k, self.info)
        if self._turn_t0 is not None:
            self.turn_wall_s.append(time.monotonic() - self._turn_t0)
            self._turn_t0 = None
        self.outcome = Outcome.Finish
        self.current_k += 1
        if self.current_k > self.max_k:
            self.journal.mark_done()
