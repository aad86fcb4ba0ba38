"""Sandboxed code-evaluation harness (HumanEval-style pass@k).

Parity target: the reference's examples/code_sft/human_eval execution
machinery — process-isolated execution of model-generated code with
resource limits, timeouts, and a disabled-os-call guard, plus the unbiased
pass@k estimator. Python-only here (the reference also shells out to other
language toolchains); the sandbox is a separate process with rlimits and a
neutered environment — NOT a security boundary, same caveat as the reference.
"""

from __future__ import annotations

import contextlib
import io
import itertools
import multiprocessing
import os
import signal
import tempfile
from typing import Dict, List, Optional, Sequence

import numpy as np


def _guard():
    """Best-effort containment for generated code (reference
    reliability_guard semantics): rlimits + disable destructive builtins."""
    import resource

    resource.setrlimit(resource.RLIMIT_AS, (2 << 30, 2 << 30))
    resource.setrlimit(resource.RLIMIT_CPU, (10, 10))
    resource.setrlimit(resource.RLIMIT_FSIZE, (1 << 20, 1 << 20))

    import builtins
    import shutil
    import subprocess as sp

    builtins.exit = None
    builtins.quit = None
    os.system = None
    os.remove = None
    os.removedirs = None
    os.rmdir = None
    os.unlink = None
    os.fork = None
    os.kill = None
    os.killpg = None
    shutil.rmtree = None
    shutil.move = None
    sp.Popen = None
    sp.call = None
    sp.run = None


def _run_one(code: str, timeout: float, result_queue):
    try:
        # tempdir before the guard (the guard disables the os calls that
        # cleanup would need; the dir is abandoned — the process dies anyway).
        d = tempfile.mkdtemp()
        os.chdir(d)
        _guard()

        def _on_alarm(signum, frame):
            raise TimeoutError("execution timed out")

        signal.signal(signal.SIGALRM, _on_alarm)
        stream = io.StringIO()
        with contextlib.redirect_stdout(stream), contextlib.redirect_stderr(stream):
            exec_globals: Dict = {"__name__": "__main__"}
            signal.alarm(int(timeout) + 1)
            exec(compile(code, "<generated>", "exec"), exec_globals)
            signal.alarm(0)
        result_queue.put("passed")
    except BaseException as e:  # noqa: BLE001 — anything from generated code
        result_queue.put(f"failed: {type(e).__name__}: {e}")


def check_correctness(
    completion: str,
    test_code: str,
    *,
    entry_point: Optional[str] = None,
    prompt: str = "",
    timeout: float = 10.0,
) -> Dict:
    """Run prompt+completion+tests in an isolated process."""
    program = "\n".join(
        [
            prompt,
            completion,
            test_code,
            f"check({entry_point})" if entry_point else "",
        ]
    )
    # spawn, not fork: the parent typically has JAX's thread pool running and
    # forked children can deadlock in arbitrary library code.
    ctx = multiprocessing.get_context("spawn")
    q = ctx.Queue()
    p = ctx.Process(target=_run_one, args=(program, timeout, q))
    p.start()
    p.join(timeout + 5)
    if p.is_alive():
        p.kill()
        p.join()
        return {"passed": False, "result": "timed out"}
    result = q.get() if not q.empty() else "failed: no result"
    return {"passed": result == "passed", "result": result}


def pass_at_k(n: int, c: int, k: int) -> float:
    """Unbiased pass@k estimator (Codex paper): 1 - C(n-c, k)/C(n, k)."""
    if n - c < k:
        return 1.0
    return float(1.0 - np.prod(1.0 - k / np.arange(n - c + 1, n + 1)))


def evaluate_functional_correctness(
    samples: Sequence[Dict],  # {"task_id", "completion"}
    problems: Dict[str, Dict],  # task_id -> {"prompt", "test", "entry_point"}
    k_values: Sequence[int] = (1,),
    timeout: float = 10.0,
) -> Dict[str, float]:
    """Returns {"pass@k": ...} over the sample set."""
    per_task: Dict[str, List[bool]] = {}
    for s in samples:
        prob = problems[s["task_id"]]
        res = check_correctness(
            s["completion"], prob["test"],
            entry_point=prob.get("entry_point"), prompt=prob["prompt"],
            timeout=timeout,
        )
        per_task.setdefault(s["task_id"], []).append(res["passed"])

    out = {}
    for k in k_values:
        vals = [
            pass_at_k(len(results), sum(results), k)
            for results in per_task.values()
            if len(results) >= k
        ]
        out[f"pass@{k}"] = float(np.mean(vals)) if vals else 0.0
    return out
