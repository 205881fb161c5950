"""Agent task environments.

Parity: the reference's task adapters (Agent/src/agent/tasks/: alfworld,
babyai, gsm8k, hotpotqa, humaneval, webshop) share one contract —
reset/step/available_actions over a text interface.  Shipped here:
  * ``GSM8KStyleTask`` — arithmetic word problems with an ``answer[x]``
    action (gsm8k adapter shape),
  * ``GridWorldTask`` — a babyai/alfworld-style navigation toy,
  * ``WebShopStyleTask`` — search/click/buy over a small catalog.
All are offline and deterministic so agent flows are testable without
external datasets.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

__all__ = ["TextTask", "GSM8KStyleTask", "GridWorldTask", "WebShopStyleTask"]


class TextTask:
    def description(self) -> str:
        raise NotImplementedError

    def reset(self) -> str:
        raise NotImplementedError

    def step(self, action: str) -> Tuple[str, float, bool]:
        """→ (observation, reward, done)"""
        raise NotImplementedError

    def available_actions(self) -> List[str]:
        raise NotImplementedError


class GSM8KStyleTask(TextTask):
    def __init__(self, a: int = 17, b: int = 25):
        self.a, self.b = a, b
        self.answer = a + b

    def description(self):
        return (
            f"Alice has {self.a} apples and buys {self.b} more. "
            "How many apples does she have? Submit with answer[<number>]."
        )

    def reset(self):
        return "Solve the problem."

    def available_actions(self):
        return ["answer[<number>]"]

    def step(self, action):
        m = re.match(r"answer\[(-?\d+)\]", action.strip())
        if not m:
            return "Invalid action format.", 0.0, False
        ok = int(m.group(1)) == self.answer
        return ("Correct!" if ok else "Wrong."), (1.0 if ok else 0.0), True


class GridWorldTask(TextTask):
    """Reach the goal on a 1-D corridor: actions left/right/done."""

    def __init__(self, length: int = 5, start: int = 0, goal: int = 3):
        self.length, self.start, self.goal = length, start, goal
        self.pos = start

    def description(self):
        return (
            f"You are in a corridor of {self.length} cells at cell "
            f"{self.start}. Reach cell {self.goal} then act done[]."
        )

    def reset(self):
        self.pos = self.start
        return f"At cell {self.pos}."

    def available_actions(self):
        return ["left[]", "right[]", "done[]"]

    def step(self, action):
        a = action.strip().lower()
        if a.startswith("left"):
            self.pos = max(0, self.pos - 1)
            return f"At cell {self.pos}.", 0.0, False
        if a.startswith("right"):
            self.pos = min(self.length - 1, self.pos + 1)
            return f"At cell {self.pos}.", 0.0, False
        if a.startswith("done"):
            ok = self.pos == self.goal
            return ("Goal!" if ok else "Not at goal."), (1.0 if ok else 0.0), True
        return "Unknown action.", 0.0, False


class WebShopStyleTask(TextTask):
    CATALOG = {
        "red shirt": 12.0,
        "blue shirt": 14.0,
        "green hat": 9.0,
        "red hat": 11.0,
    }

    def __init__(self, target: str = "red hat", budget: float = 12.0):
        self.target = target
        self.budget = budget
        self.results: List[str] = []

    def description(self):
        return (
            f"Buy a '{self.target}' within budget ${self.budget:.2f}. "
            "Use search[query], click[item], buy[]."
        )

    def reset(self):
        self.results = []
        self.cart: Optional[str] = None
        return "Welcome to the shop."

    def available_actions(self):
        return ["search[<query>]", "click[<item>]", "buy[]"]

    def step(self, action):
        a = action.strip()
        m = re.match(r"search\[(.+)\]", a)
        if m:
            q = m.group(1).lower()
            self.results = [k for k in self.CATALOG if all(w in k for w in q.split())]
            return f"Results: {self.results}", 0.0, False
        m = re.match(r"click\[(.+)\]", a)
        if m:
            item = m.group(1).lower()
            if item in self.CATALOG:
                self.cart = item
                return f"{item}: ${self.CATALOG[item]:.2f}", 0.0, False
            return "No such item.", 0.0, False
        if a.startswith("buy"):
            ok = (
                self.cart == self.target
                and self.CATALOG[self.cart] <= self.budget
            )
            return ("Purchased!" if ok else "Bad purchase."), (1.0 if ok else 0.0), True
        return "Unknown action.", 0.0, False
