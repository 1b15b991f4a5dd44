"""Reference-parity pipeline: the abilities parser as a Spark plan.

Re-expresses `generate_ability_df` (reference web_scraper.py:344-567)
declaratively over the html-lines IR (FIXTURES.md T7).  Populated by the
parser milestone (M2); fixture-driven golden tests live in
tests/test_abilities_golden.py.
"""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
