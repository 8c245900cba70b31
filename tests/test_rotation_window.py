"""Guards on the driver-evidence rotation window in verification.py.

The external driver checks exactly the first 50 registry entries per round
(rounds 1-6 each recorded 50 rows), and its only green mode is a full
rows+schema+value-hash match against the entry's own oracle SQL. Two past
mistakes are made hard failures here:

- round 3's rotation listed 51 names, so the 51st (`sim_topk_quantized`)
  silently fell outside the window and got no driver row;
- round 4 spent 10 of its 50 slots on rows-only (sql=None) entries that
  by construction can only ever record `no_oracle`.

Contracts enforced:

- the head (anchors + rotation) is exactly 50 names;
- every head / pool name carries a DuckDB oracle (rows-only entries are
  verified in pytest and stay in the registry tail);
- no rotation slot is spent on a name that already has a driver-green row
  (frozen in _PAST_DRIVER_GREEN);
- anchors are all previously driver-green (they exist to re-confirm);
- no duplicates anywhere in _PRIORITY;
- pools are named for the round whose rotation they hold (renamed at
  round 10 from the historical offset names per the round-9 advisor
  finding): `_ROUND{N}_POOL` is promoted verbatim into _ROTATION at
  round N, so each promotion is a straight copy.
"""

from ascii_hydra_spark import verification as v


def test_head_is_exactly_driver_window() -> None:
    head = v._ANCHORS + v._ROTATION
    assert len(head) == v._DRIVER_HEAD == 50
    assert list(v.REGISTRY)[: len(head)] == list(head)


def test_no_duplicate_priority_names() -> None:
    assert len(set(v._PRIORITY)) == len(v._PRIORITY)


def test_rotation_slots_buy_first_time_evidence() -> None:
    wasted = set(v._ROTATION) & v._PAST_DRIVER_GREEN
    assert not wasted, f"rotation slots wasted on already-green: {sorted(wasted)}"


def test_anchors_are_known_green_families() -> None:
    assert set(v._ANCHORS) <= v._PAST_DRIVER_GREEN


def test_priority_names_all_registered() -> None:
    assert set(v._PRIORITY) <= set(v.REGISTRY)


def test_head_and_pools_are_all_oracle_able() -> None:
    # a rows-only name in the head records `no_oracle`, wasting the slot;
    # queued/pooled names are future heads so the same rule applies
    bad = [
        n
        for n in v._ROTATION + tuple(x for pool in v._POOLS for x in pool)
        if v.REGISTRY[n].sql is None
    ]
    assert not bad, f"rows-only names in head/pools: {bad}"


def test_every_sql_entry_is_scheduled_for_driver_evidence() -> None:
    # every SQL-oracle entry is either already driver-green or holds a
    # slot in the head / a future pool — nothing silently unscheduled
    scheduled = (
        set(v._ANCHORS)
        | set(v._ROTATION)
        | {n for pool in v._POOLS for n in pool}
        | v._PAST_DRIVER_GREEN
    )
    unscheduled = [
        n for n, s in v.REGISTRY.items() if s.sql is not None and n not in scheduled
    ]
    assert not unscheduled, f"SQL entries with no driver slot: {unscheduled}"


def test_pool_names_match_the_round_they_serve() -> None:
    # the round-9 advisor finding: offset pool names risk promoting the
    # wrong tuple. Pools must be _ROUND{N}_POOL with N strictly
    # increasing, and _POOLS must list them in promotion order.
    expected = ("_ROUND12_POOL", "_ROUND13_POOL")
    for name, pool in zip(expected, v._POOLS):
        assert getattr(v, name) is pool, f"_POOLS order does not match {name}"
    assert len(v._POOLS) == len(expected)


def test_next_pool_is_a_full_first_time_rotation() -> None:
    # the first pool is next round's rotation: every name
    # never-driver-checked and disjoint from the current head. It must
    # hold exactly 45 slots UNLESS the registry has no unscheduled
    # SQL-oracle entries left to fill it with — after the round-11
    # promotion every remaining oracle-able entry is already queued, and
    # optimization rounds may not add query entries, so a partial final
    # pool is the correct state (it simply drains over future rounds).
    nxt = v._POOLS[0]
    unscheduled = [
        n
        for n, s in v.REGISTRY.items()
        if s.sql is not None
        and n not in v._PAST_DRIVER_GREEN
        and n not in set(v._ANCHORS + v._ROTATION)
        and all(n not in pool for pool in v._POOLS)
    ]
    assert len(nxt) == 45 or (len(nxt) < 45 and not unscheduled)
    assert not (set(nxt) & v._PAST_DRIVER_GREEN)
    assert not (set(nxt) & set(v._ANCHORS + v._ROTATION))
    assert set(nxt) <= set(v.REGISTRY)


def test_later_pools_are_first_time_and_disjoint() -> None:
    # later pools may still be filling toward 45; each must be disjoint
    # from every earlier block and never-driver-checked
    earlier = set(v._ANCHORS + v._ROTATION)
    for pool in v._POOLS:
        assert len(pool) <= 45
        assert not (set(pool) & v._PAST_DRIVER_GREEN)
        assert not (set(pool) & earlier)
        assert set(pool) <= set(v.REGISTRY)
        earlier |= set(pool)


def test_rows_only_entries_stay_verified_in_pytest() -> None:
    # every rows-only entry must appear in some pytest module by name so
    # dropping it from the driver window never drops its verification
    import pathlib

    tests_dir = pathlib.Path(__file__).parent
    corpus = "\n".join(
        p.read_text() for p in tests_dir.glob("test_*.py") if p.name != "test_rotation_window.py"
    )
    rows_only = [n for n, s in v.REGISTRY.items() if s.sql is None]
    missing = [n for n in rows_only if n not in corpus]
    assert not missing, f"rows-only entries with no pytest reference: {missing}"
