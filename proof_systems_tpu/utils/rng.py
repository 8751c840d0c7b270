"""Randomness sources for blinders and verifier weights.

`TestRng` is a deterministic seeded source for reproducible tests;
`SystemRng` draws from the OS CSPRNG for production proving.
(The reference uses rand::thread_rng / seeded StdRng in tests.)
"""

from __future__ import annotations

import random
import secrets


class TestRng:
    def __init__(self, seed: int = 0):
        self._rng = random.Random(seed)

    def field(self, p: int) -> int:
        return self._rng.randrange(p)


class SystemRng:
    def field(self, p: int) -> int:
        return secrets.randbelow(p)
