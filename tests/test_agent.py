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
