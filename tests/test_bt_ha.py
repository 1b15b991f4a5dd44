"""BT-effect and high-armor parse parity (SURVEY.md §2d A4/A5).

Expected values recomputed independently from the fixture dicts — the
parser must recover exactly the planted per-character sums."""

from __future__ import annotations

from dffoo_data_pipeline_spark.plans import bt_ha


def test_bt_effects_recover_planted_sums(spark):
    got = {r.char_name: r for r in bt_ha.bt_effects_parse(spark, "").collect()}
    assert set(got) == set(bt_ha.BT_FIXTURES)
    for char, (personal, party, enemies) in bt_ha.BT_FIXTURES.items():
        r = got[char]
        assert r.bt_personal_hp_dmg_cap_up == sum(personal), char
        assert r.bt_party_hp_dmg_cap_up == sum(party), char
        assert r.enemy_counts_csv == ",".join(map(str, enemies)), char
        assert r.game_version == "GL"


def test_ha_caps_accumulate_across_blocks(spark):
    got = {r.char_name: r for r in bt_ha.ha_caps_parse(spark, "").collect()}
    assert set(got) == set(bt_ha.HA_FIXTURES)
    for char, blocks in bt_ha.HA_FIXTURES.items():
        r = got[char]
        assert r.personal_hp_dmg_cap_up == sum(p for p, _ in blocks), char
        assert r.party_ha_hp_dmg_cap_up == sum(q for _, q in blocks), char
