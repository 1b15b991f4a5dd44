"""Synthetic html-lines fixtures for the abilities parser (FIXTURES.md T7).

The reference parses prettified wiki HTML by fixed relative line offsets
(reference web_scraper.py:387-490).  We cannot redistribute the wiki's
HTML, so these builders synthesize line sequences that carry the trigger
phrases at the exact offsets the parser contract requires:

- `- MAX BRV Cap`      → value 6 lines later        (web_scraper.py:391-392)
- `MAX BRV Cap Up by`  → value 2 lines later        (web_scraper.py:394-395)
- `inline HP` icon     → attack info at +2 (default), +6 (stat-based or
  `Crystal Generation`), +11 (stored value), +13 (BREAK + non-target)
                                                     (web_scraper.py:421-442)
- classification phrases `Group N times`, `to non-targets × N`,
  `Damage to non-targets after each HP Attack[, except last]`, `N times`
                                                     (web_scraper.py:449-478)
- a hit icon is SKIPPED when the line two above contains `Attack`
                                                     (web_scraper.py:412-413)

Each golden character from the reference's test cases
(character_ability_test_cases/*.csv) is assembled from these blocks so the
parser must reproduce the exact golden counts.
"""

from __future__ import annotations

PAD = '<div class="bluebase separator">'

# --- block builders: each returns a list of lines ---------------------------


def cap_block(value: int) -> list[str]:
    """`- MAX BRV Cap` line with its value 6 lines later."""
    return [
        '<span class="buffunbreak">- MAX BRV Cap</span>',
        PAD,
        PAD,
        PAD,
        PAD,
        PAD,
        f"          {value}%",
    ]


def capup_block(value: int) -> list[str]:
    """`MAX BRV Cap Up by` line with its value 2 lines later."""
    return ["MAX BRV Cap Up by", PAD, f"  {value}%"]


def hit_block(
    info: str = PAD,
    pre1: str = PAD,
    pre2: str = PAD,
    pre3: str = PAD,
    l6: str = PAD,
    l11: str = PAD,
    l13: str = PAD,
) -> list[str]:
    """An `inline HP` icon with every offset slot addressable.

    Layout (icon at relative index 3): [i-3, i-2, i-1, icon, i+1, i+2,
    i+3..i+5, i+6, i+7..i+10, i+11, i+12, i+13] + 2 pad lines.
    """
    return [
        pre3,
        pre2,
        pre1,
        '<img alt="HP Attack Icon" class="inline HP">',
        PAD,
        info,
        PAD,
        PAD,
        PAD,
        l6,
        PAD,
        PAD,
        PAD,
        PAD,
        l11,
        PAD,
        l13,
        PAD,
        PAD,
    ]


# --- semantic variants ------------------------------------------------------


def main1() -> list[str]:
    return hit_block(info="HP Attack on the target")


def mainN(n: int) -> list[str]:
    return hit_block(info=f"Attack {n} times")


def groupN(n: int) -> list[str]:
    return hit_block(info=f"Group {n} times")


def group1() -> list[str]:
    return hit_block(info="Group attack")


def ctx_aoe(n: int) -> list[str]:
    """AOE inferred from the line just before the icon (i-1)."""
    return hit_block(pre1="Group attack header", info=f"Attack {n} times")


def ctx_aoe3(n: int) -> list[str]:
    """AOE inferred from three lines before the icon (i-3)."""
    return hit_block(pre3="Group attack header", info=f"Attack {n} times")


def non_x(n: int) -> list[str]:
    return hit_block(info=f"HP Damage to non-targets × {n}")


def non_times(n: int) -> list[str]:
    return hit_block(info=f"HP Damage to non-targets {n} times")


def non1() -> list[str]:
    return hit_block(info="HP Damage to non-targets")


def nontrap_times(n: int) -> list[str]:
    return hit_block(info=f"HP Damage to non-trap triggered targets {n} times")


def copy_st() -> list[str]:
    return hit_block(info="Damage to non-targets after each HP Attack")


def copy_st_except_last() -> list[str]:
    return hit_block(info="Damage to non-targets after each HP Attack, except last")


def stored_value(inner: str) -> list[str]:
    """Stored-value ability: info at +11 (web_scraper.py:428-432)."""
    return hit_block(
        info="HP Damage by stored value",
        l6="50% of stored value from BRV hits",
        l11=inner,
    )


def stat_based(n: int) -> list[str]:
    """Stat-based ability: info at +6 (web_scraper.py:434-442)."""
    return hit_block(
        info="HP Damage by ATK",
        l6=f"Attack {n} times with power of ATK",
    )


def break_nontarget(n: int) -> list[str]:
    """BREAK-icon + non-target at +13 (Serah/Snow EX, web_scraper.py:437-439)."""
    return hit_block(
        info="HP Damage by stored BRV",
        l6="a ratio of stored BRV",
        l11='<img class="inline BREAK">',
        l13=f"HP Damage to non-targets × {n}",
    )


def decoy_skipped_hit() -> list[str]:
    """Icon that must be skipped: `Attack` two lines above
    (web_scraper.py:412-413)."""
    return hit_block(pre2="Attack source descriptor")


# --- golden characters (targets from character_ability_test_cases/*.csv) ----

GOLDEN_FIXTURES: dict[str, list[tuple[str, int, list[list[str]]]]] = {
    "aerith": [
        ("HP Attack+", 10001, [main1()]),
        ("HP Attack++", 10002, [main1()]),
        ("HP Attack+++", 10003, [main1()]),
        ("HP Attack (Seal Evil)", 10004, [groupN(3)]),
        ("Fury Brand Follow Up", 10005, [stat_based(7), capup_block(10)]),
        ("Seal Evil", 10006, [groupN(5), capup_block(15)]),
        ("Additional attack from Seal Evil", 10007, [groupN(2), capup_block(15)]),
        ("Holy", 10008, [groupN(7), cap_block(400)]),
        (
            "Additional attack from White Materia's Brilliance",
            10009,
            [stored_value("Group attack")],
        ),
    ],
    "astos": [
        ("HP Attack++", 20001, [main1()]),
        ("Cremation", 20002, [main1(), non1(), cap_block(10)]),
        ("HP Attack+", 20003, [main1()]),
        ("Dark Thrust", 20004, [mainN(10), capup_block(20)]),
        ("Dark Slash", 20005, [mainN(5), copy_st(), cap_block(20)]),
        ("Dark Warhammer", 20006, [mainN(2), copy_st_except_last(), mainN(7), cap_block(10)]),
        ("Dark Glory", 20007, [ctx_aoe(7), capup_block(15)]),
        ("Flare Star", 20008, [stored_value("Group 2 times"), cap_block(350)]),
        ("Conflict Ultima", 20009, [groupN(4), cap_block(250), capup_block(10)]),
    ],
    "auron": [
        ("HP Attack+", 30001, [group1()]),
        ("Banishing Blade", 30002, [mainN(3), non_x(1), cap_block(20)]),
        ("Purgatory", 30003, [mainN(2), copy_st(), capup_block(20)]),
        ("Weak Damage Up Crush", 30004, [main1(), decoy_skipped_hit()]),
        ("Dragon Fang", 30005, [groupN(4), cap_block(10)]),
        ("Tornado", 30006, [ctx_aoe3(4), capup_block(15)]),
        ("Counter", 30007, [mainN(3), copy_st(), cap_block(10)]),
    ],
    "lenna": [
        ("HP Attack+", 40001, [main1()]),
        ("Dragon Breath", 40002, [groupN(3), cap_block(10)]),
        ("Rapid Fire", 40003, [ctx_aoe(3), cap_block(20)]),
        ("Rapid Fire+", 40004, [ctx_aoe3(3), capup_block(20)]),
        ("Wind Drake Arrow", 40005, [group1(), cap_block(20)]),
        ("Wind Drake Arrow+", 40006, [group1(), capup_block(20)]),
        ("Brave Phoenix", 40007, [groupN(4), cap_block(10)]),
        ("Goliath Tonic & Dragon Breath", 40008, [groupN(3), capup_block(15)]),
    ],
    "paine": [
        ("HP Attack+", 50001, [main1()]),
        ("HP Attack++", 50002, [main1(), decoy_skipped_hit()]),
        ("Break Attack", 50003, [mainN(2), copy_st(), mainN(4), cap_block(20)]),
        ("Black Sky", 50004, [groupN(5), capup_block(20)]),
        ("Sword Dance", 50005, [mainN(3), copy_st(), cap_block(10)]),
        ("Sword Dance+", 50006, [ctx_aoe(6), capup_block(10)]),
        ("Wild Throttle", 50007, [mainN(2), non_x(2), mainN(6), capup_block(15)]),
        ("Gullwing Rush", 50008, [mainN(2), break_nontarget(2), cap_block(400)]),
        ("Dark Shroud", 50009, [groupN(4), cap_block(250), capup_block(10)]),
    ],
    "sherlotta": [
        ("Hurl Staff", 60001, [main1()]),
        ("Hurl Staff+", 60002, [main1(), non1()]),
        ("Chuck Staff", 60003, [groupN(4)]),
        (
            "Crystal Generation",
            60004,
            # +6-by-name path: info slot empty, attack line at +6, AOE context
            [hit_block(pre1="Group crystal field", l6="Attack 5 times"), capup_block(20)],
        ),
        ("Crystal Ray", 60005, [groupN(4), capup_block(15)]),
        ("Final Crystal Core", 60006, [groupN(2), cap_block(400)]),
        ("Crystal Dice", 60007, [groupN(4), cap_block(250), capup_block(10)]),
    ],
    "warrioroflight": [
        ("HP Attack+", 70001, [main1()]),
        ("HP Attack++", 70002, [main1()]),
        ("Shining Shield Follow Up", 70003, [mainN(6), capup_block(20)]),
        ("Throw Buckler", 70004, [groupN(4), cap_block(20)]),
        ("Shining Wave", 70005, [groupN(4), capup_block(10)]),
        ("Bitter End", 70006, [mainN(2), copy_st_except_last(), mainN(4), capup_block(7)]),
        ("Ultimate Shield", 70007, [groupN(2), cap_block(400)]),
        ("Soul of Light", 70008, [groupN(4), cap_block(250), capup_block(10)]),
    ],
}


def ability_line_rows(
    fixtures: dict | None = None, game_version: str = "GL"
) -> list[tuple[str, str, int, str, int, str]]:
    """Flatten fixtures → (char_name, ability_name, ability_id,
    game_version, line_no, line) rows for schemas.ABILITY_HTML_LINES."""
    fixtures = GOLDEN_FIXTURES if fixtures is None else fixtures
    rows = []
    for char, abilities in fixtures.items():
        for ability_name, ability_id, blocks in abilities:
            lines: list[str] = ["<div>ability header</div>", PAD]
            for block in blocks:
                lines.extend(block)
            lines.extend([PAD, PAD])
            for line_no, line in enumerate(lines):
                rows.append((char, ability_name, ability_id, game_version, line_no, line))
    return rows
