"""ROSLLM behavior-executor analogue (agent/behavior.py)."""

from hebo_tpu.agent.behavior import AgentComm, BehaviorExecutor, Info


def make_exec():
    ex = BehaviorExecutor()
    ex.register("say", lambda inp, prev: (True, inp))
    ex.register("append", lambda inp, prev: (True, prev + "+" + inp))
    ex.register("fail", lambda inp, prev: (False, "nope"))
    state = {"n": 0}

    def flaky(inp, prev):
        state["n"] += 1
        return state["n"] >= 2, f"try{state['n']}"

    ex.register("flaky", flaky)
    ex.register("boom", lambda inp, prev: 1 / 0)
    return ex


def test_sequence_chains_outputs():
    ex = make_exec()
    ok, msg, info = ex.execute_behavior("(seq (say a) (append b) (append c))")
    assert ok and info is Info.OK
    assert ex.trace[-1][2] == "a+b+c"


def test_fallback_recovers():
    ex = make_exec()
    ok, _, info = ex.execute_behavior("(fallback (fail x) (say recovered))")
    assert ok and info is Info.OK
    assert ex.trace[-1] == ("say", True, "recovered")


def test_retry_until_success():
    ex = make_exec()
    ok, _, info = ex.execute_behavior("(retry 3 (flaky))")
    assert ok and info is Info.OK


def test_failure_and_info_codes():
    ex = make_exec()
    ok, _, info = ex.execute_behavior("(seq (fail x))")
    assert not ok and info is Info.CODE_EXECUTION_ERROR
    ok, _, info = ex.execute_behavior("(seq (unknown_action))")
    assert not ok and info is Info.ATOMIC_ACTION_UNAVAILABLE
    ok, _, info = ex.execute_behavior("(seq (say a")
    assert not ok and info is Info.FAILED_TO_COMPILE
    ok, _, info = ex.execute_behavior("")
    assert ok and info is Info.NULL_BEHAVIOR
    ok, _, info = ex.execute_behavior("(seq (boom))")
    assert not ok and info is Info.ERROR_ATOMIC_ACTION


def test_linear_script_form():
    ex = make_exec()
    ok, _, info = ex.execute_behavior("say a\nappend b")
    assert ok and info is Info.OK
    assert ex.trace[-1][2] == "a+b"


def test_agent_comm_loop():
    ex = make_exec()

    def backend(prompt):
        assert "say" in prompt and "Observations" in prompt
        return "(seq (say hello) (append world))"

    comm = AgentComm(backend, ex)
    ok, msg, info = comm.step(["robot is idle"])
    assert ok and info is Info.OK
    assert ex.trace[-1][2] == "hello+world"
