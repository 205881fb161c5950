"""Agent flow-engine tests with a deterministic mock LLM."""

import numpy as np
import pytest

from hebo_tpu.agent.core import (
    ActCommand,
    Agent,
    DecideCommand,
    DecisionFlow,
    LoopFlow,
    SequentialFlow,
    ThinkCommand,
)
from hebo_tpu.agent.llm import MockLLM
from hebo_tpu.agent.logger import EpisodeLogger
from hebo_tpu.agent.parsers import parse_action, parse_final_answer
from hebo_tpu.agent.tasks import GridWorldTask, GSM8KStyleTask, WebShopStyleTask


def test_parse_action():
    assert parse_action("I will go right.\nAction: right[]") == "right[]"
    assert parse_action("answer[42] is my move") == "answer[42]"
    assert parse_action("no action here") == ""
    assert parse_final_answer("Final answer: 42") == "42"


def test_gsm8k_flow_success():
    llm = MockLLM(script=[
        "17 + 25 = 42, so the answer is 42.",
        "Action: answer[42]",
    ])
    env = GSM8KStyleTask(17, 25)
    flow = SequentialFlow([ThinkCommand(), ActCommand()])
    agent = Agent(llm, env, flow)
    reward = agent.run()
    assert reward == 1.0
    kinds = [s["kind"] for s in agent.memory.steps]
    assert "thought" in kinds and "action" in kinds


def test_gridworld_loop_flow():
    # scripted actions: move right 3x then done
    llm = MockLLM(script=[
        "Action: right[]", "Action: right[]", "Action: right[]", "Action: done[]",
    ])
    env = GridWorldTask(length=5, start=0, goal=3)
    flow = LoopFlow(ActCommand(), max_iters=8)
    agent = Agent(llm, env, flow)
    assert agent.run() == 1.0


def test_decision_flow_branches():
    llm = MockLLM(rules={
        "Options: shop, solve": "shop",
        "Available actions": "Action: search[red hat]",
    })
    env = WebShopStyleTask()
    decide = DecideCommand("What kind of task is this?", ["shop", "solve"])
    flow = DecisionFlow(decide, {"shop": ActCommand(), "solve": ThinkCommand()})
    agent = Agent(llm, env, flow)
    agent.run()
    decisions = [s for s in agent.memory.steps if s["kind"] == "decision"]
    assert decisions and decisions[0]["content"] == "shop"
    obs = [s for s in agent.memory.steps if s["kind"] == "observation"]
    assert any("red hat" in s["content"] for s in obs)


def test_webshop_full_episode():
    llm = MockLLM(script=[
        "Action: search[red hat]",
        "Action: click[red hat]",
        "Action: buy[]",
    ])
    env = WebShopStyleTask(target="red hat", budget=12.0)
    flow = LoopFlow(ActCommand(), max_iters=6)
    agent = Agent(llm, env, flow)
    assert agent.run() == 1.0


def test_episode_logger(tmp_path):
    p = str(tmp_path / "episodes.jsonl")
    llm = MockLLM(script=["Action: answer[42]"])
    env = GSM8KStyleTask(17, 25)
    agent = Agent(llm, env, LoopFlow(ActCommand(), 2), logger=EpisodeLogger(p))
    agent.run()
    import json

    lines = open(p).read().strip().splitlines()
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert rec["reward"] == 1.0


def test_hotpotqa_style_task():
    from hebo_tpu.agent.tasks import HotpotQAStyleTask

    t = HotpotQAStyleTask(0)
    obs = t.reset()
    assert "Question:" in obs
    _, r, done = t.step("answer[Georgia]")
    assert r == 1.0 and done
    _, r_partial, _ = t.step("answer[the state of Georgia]")
    assert 0.0 < r_partial <= 1.0
    # yes/no questions are exact-match (reference hotpotqa.py:47-52)
    t2 = HotpotQAStyleTask(1)
    t2.reset()
    _, r_yes, _ = t2.step("answer[yes]")
    _, r_no, _ = t2.step("answer[certainly yes]")
    assert r_yes == 1.0 and r_no == 0.0


def test_humaneval_style_task():
    from hebo_tpu.agent.tasks import HumanEvalStyleTask

    t = HumanEvalStyleTask(0)
    prompt = t.reset()
    assert prompt.startswith("def add_positive")
    _, r, done = t.step(
        "def add_positive(xs):\n    return sum(x for x in xs if x > 0)"
    )
    assert r == 1.0 and done
    _, r_bad, _ = t.step("def add_positive(xs):\n    return len(xs)")
    assert r_bad == 0.0
    # bare-body form is accepted too
    _, r_body, _ = t.step("return sum(x for x in xs if x > 0)")
    assert r_body == 1.0
    # broken code scores 0, never raises
    _, r_err, _ = t.step("def add_positive(xs:\n   oops")
    assert r_err == 0.0


def test_alfworld_style_task():
    from hebo_tpu.agent.tasks import AlfWorldStyleTask

    t = AlfWorldStyleTask(goal_obj="apple", goal_recep="fridge")
    t.reset()
    _, r, d = t.step("take[apple]")
    assert r == 0.0 and not d
    _, r, d = t.step("put[apple in fridge]")
    assert r == 1.0 and d
    # wrong receptacle is not terminal success
    t.reset()
    t.step("take[mug]")
    _, r, d = t.step("put[mug in cabinet]")
    assert r == 0.0 and not d
    # navigation works
    t.reset()
    obs, _, _ = t.step("go[lounge]")
    assert "lounge" in obs


def test_agent_flow_on_new_tasks():
    """The command/flow engine solves the new adapters with a scripted
    policy (same pattern as the existing agent tests)."""
    from hebo_tpu.agent.core import ActCommand, Agent, LoopFlow
    from hebo_tpu.agent.llm import MockLLM
    from hebo_tpu.agent.tasks import AlfWorldStyleTask

    llm = MockLLM(script=["take[apple]", "put[apple in fridge]"])
    env = AlfWorldStyleTask()
    flow = LoopFlow(ActCommand(), max_iters=4)
    agent = Agent(llm, env, flow)
    total = agent.run()
    assert total == 1.0
