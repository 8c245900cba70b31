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
- `_ROUND8_POOL` (the variable names are historical — each
  `_ROUND{N}_POOL` holds round N+2's rotation) holds exactly the next
  rotation's 45 slots, so next round's promotion is a straight copy.
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
        for n in v._ROTATION + v._ROUND8_POOL + v._ROUND9_POOL
        + v._ROUND10_POOL + v._ROUND11_POOL + v._ROUND12_POOL
        if v.REGISTRY[n].sql is None
    ]
    assert not bad, f"rows-only names in head/pools: {bad}"


def test_every_sql_entry_is_scheduled_for_driver_evidence() -> None:
    # every SQL-oracle entry is either already driver-green or holds a
    # slot in the head / a future pool — nothing silently unscheduled
    scheduled = (
        set(v._ANCHORS)
        | set(v._ROTATION)
        | set(v._ROUND8_POOL)
        | set(v._ROUND9_POOL)
        | set(v._ROUND10_POOL)
        | set(v._ROUND11_POOL)
        | set(v._ROUND12_POOL)
        | v._PAST_DRIVER_GREEN
    )
    unscheduled = [
        n for n, s in v.REGISTRY.items() if s.sql is not None and n not in scheduled
    ]
    assert not unscheduled, f"SQL entries with no driver slot: {unscheduled}"


def test_round8_pool_is_a_full_first_time_rotation() -> None:
    # exactly the 45 rotation slots round 8 needs, every name
    # never-driver-checked and disjoint from every earlier block
    assert len(v._ROUND8_POOL) == 45
    assert not (set(v._ROUND8_POOL) & v._PAST_DRIVER_GREEN)
    assert not (set(v._ROUND8_POOL) & set(v._ANCHORS + v._ROTATION))
    assert set(v._ROUND8_POOL) <= set(v.REGISTRY)


def test_round9_pool_is_first_time_and_disjoint() -> None:
    # overflow beyond round 8; may still be filling toward 45
    assert len(v._ROUND9_POOL) <= 45
    assert not (set(v._ROUND9_POOL) & v._PAST_DRIVER_GREEN)
    earlier = set(v._ANCHORS + v._ROTATION + v._ROUND8_POOL)
    assert not (set(v._ROUND9_POOL) & earlier)
    assert set(v._ROUND9_POOL) <= set(v.REGISTRY)


def test_round10_pool_is_first_time_and_disjoint() -> None:
    # round-6/7 additions; may still be filling toward 45
    assert len(v._ROUND10_POOL) <= 45
    assert not (set(v._ROUND10_POOL) & v._PAST_DRIVER_GREEN)
    earlier = set(
        v._ANCHORS + v._ROTATION + v._ROUND8_POOL + v._ROUND9_POOL
    )
    assert not (set(v._ROUND10_POOL) & earlier)
    assert set(v._ROUND10_POOL) <= set(v.REGISTRY)


def test_round11_pool_is_first_time_and_disjoint() -> None:
    # overflow past round 10's 45 slots; may still be filling toward 45
    assert len(v._ROUND11_POOL) <= 45
    assert not (set(v._ROUND11_POOL) & v._PAST_DRIVER_GREEN)
    earlier = set(
        v._ANCHORS + v._ROTATION + v._ROUND8_POOL + v._ROUND9_POOL
        + v._ROUND10_POOL
    )
    assert not (set(v._ROUND11_POOL) & earlier)
    assert set(v._ROUND11_POOL) <= set(v.REGISTRY)


def test_round12_pool_is_first_time_and_disjoint() -> None:
    # overflow past round 11's 45 slots; may still be filling toward 45
    assert len(v._ROUND12_POOL) <= 45
    assert not (set(v._ROUND12_POOL) & v._PAST_DRIVER_GREEN)
    earlier = set(
        v._ANCHORS + v._ROTATION + v._ROUND8_POOL + v._ROUND9_POOL
        + v._ROUND10_POOL + v._ROUND11_POOL
    )
    assert not (set(v._ROUND12_POOL) & earlier)
    assert set(v._ROUND12_POOL) <= set(v.REGISTRY)


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
