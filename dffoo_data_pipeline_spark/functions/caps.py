"""HP-damage-cap expression library — the reference's core domain semantic.

The game caps a single HP attack at 99,999 damage; "HP Dmg Cap +N%"
passives raise that ceiling by 1,000 per percent point (+10% → 109,999).
The reference encodes "uncapped" attacks with the sentinel cap-up value
900, chosen because it lands exactly on the true uncapped ceiling:
99,999 + 900·1,000 = 999,999 ("Takes a character from 99,999 dmg to
999,999 dmg", reference web_scraper.py:523,537; sentinel assignment at
web_scraper.py:507-508).

Everything here is a plain integer column expression — JVM-side,
whole-stage-codegen-friendly, broadcastable into any plan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BASE_HP_DMG_CAP = 99_999
UNCAPPED_SENTINEL = 900  # cap-up % that means "this attack is uncapped"
DMG_PER_CAP_POINT = 1_000  # each +1% cap-up adds 1,000 to the ceiling


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def effective_hp_dmg_cap(cap_up_perc) -> Column:
    """Per-attack damage ceiling after +N% cap-up passives (INT).

    Uniform affine tier: 99,999 + 1,000·N.  The 900 sentinel needs no
    special case — it lands exactly on the uncapped 999,999 ceiling, which
    is why the reference picked it (web_scraper.py:523).
    """
    return (
        F.lit(BASE_HP_DMG_CAP) + F.lit(DMG_PER_CAP_POINT) * _col(cap_up_perc).cast("int")
    ).alias("effective_hp_dmg_cap")


def is_uncapped(cap_up_perc) -> Column:
    """True when the cap-up value is the reference's uncapped sentinel."""
    return (_col(cap_up_perc).cast("int") == F.lit(UNCAPPED_SENTINEL)).alias("is_uncapped")


def total_party_cap_up(personal, party) -> Column:
    """A character's own ceiling boost: personal cap-up stacks on top of
    the party-wide aura (reference stg_bt_effects.sql keeps both columns;
    the analyzer sums them for the activating character)."""
    return (_col(personal).cast("int") + _col(party).cast("int")).alias("total_cap_up")
