"""Sandboxed code-eval harness tests."""

import numpy as np
import pytest

from aria_tpu.evals.code_exec import (
    check_correctness,
    evaluate_functional_correctness,
    pass_at_k,
)

PROBLEM = {
    "prompt": "def add(a, b):\n",
    "test": (
        "def check(candidate):\n"
        "    assert candidate(1, 2) == 3\n"
        "    assert candidate(-1, 1) == 0\n"
    ),
    "entry_point": "add",
}


class TestSandbox:
    def test_correct_solution_passes(self):
        res = check_correctness("    return a + b\n", PROBLEM["test"],
                                entry_point="add", prompt=PROBLEM["prompt"])
        assert res["passed"], res

    def test_wrong_solution_fails(self):
        res = check_correctness("    return a - b\n", PROBLEM["test"],
                                entry_point="add", prompt=PROBLEM["prompt"])
        assert not res["passed"]
        assert "AssertionError" in res["result"]

    def test_infinite_loop_times_out(self):
        res = check_correctness(
            "    while True: pass\n", PROBLEM["test"],
            entry_point="add", prompt=PROBLEM["prompt"], timeout=2.0,
        )
        assert not res["passed"]

    def test_os_system_disabled(self):
        res = check_correctness(
            "    import os; os.system('echo pwned'); return a + b\n",
            PROBLEM["test"], entry_point="add", prompt=PROBLEM["prompt"],
        )
        assert not res["passed"]  # os.system is None -> TypeError


class TestPassAtK:
    def test_exact_values(self):
        assert pass_at_k(1, 1, 1) == 1.0
        assert pass_at_k(1, 0, 1) == 0.0
        assert pass_at_k(2, 1, 1) == pytest.approx(0.5)
        assert pass_at_k(10, 3, 1) == pytest.approx(0.3)
        assert pass_at_k(4, 2, 2) == pytest.approx(1 - (2 / 4) * (1 / 3))

    def test_evaluate(self):
        problems = {"t0": PROBLEM}
        samples = [
            {"task_id": "t0", "completion": "    return a + b\n"},
            {"task_id": "t0", "completion": "    return a * b\n"},
        ]
        out = evaluate_functional_correctness(samples, problems, k_values=(1, 2))
        assert out["pass@1"] == pytest.approx(0.5)
        assert out["pass@2"] == pytest.approx(1.0)


class TestMultiLanguage:
    def test_cpp_pass_and_fail(self):
        ok = check_correctness(
            "#include <cassert>\nint add(int a,int b){return a+b;}\n",
            "int main(){ assert(add(1,2)==3); return 0; }\n",
            language="cpp",
        )
        assert ok["passed"], ok
        bad = check_correctness(
            "#include <cassert>\nint add(int a,int b){return a-b;}\n",
            "int main(){ assert(add(1,2)==3); return 0; }\n",
            language="cpp",
        )
        assert not bad["passed"]

    def test_cpp_compile_error_reported(self):
        res = check_correctness("int add(int a,int b){return a+b\n", "", language="cpp")
        assert not res["passed"] and "compile" in res["result"]

    def test_missing_toolchain_is_graceful(self):
        res = check_correctness("console.log(1)", "", language="go")
        assert not res["passed"]

    def test_shell_language(self):
        res = check_correctness("x=3", 'test "$x" = 3', language="sh")
        assert res["passed"], res
