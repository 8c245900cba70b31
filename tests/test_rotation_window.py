"""Guards on the driver-evidence rotation window in verification.py.

The external driver checks exactly the first 50 registry entries per round
(rounds 1-3 each recorded 50 rows). Round 3's rotation listed 51 names
before the position-51 comment, so the 51st (`sim_topk_quantized`) silently
fell outside the window and got no driver row despite being explicitly
rotated in. These tests make that class of mistake a hard failure:

- the head (anchors + rotation) is exactly 50 names;
- no rotation slot is spent on a name that already has a driver-green row
  (frozen in _PAST_DRIVER_GREEN);
- anchors are all previously driver-green (they exist to re-confirm);
- no duplicates anywhere in _PRIORITY;
- the round-5 queue contains only never-checked names, so next round's
  rotation is a straight copy.
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


def test_round5_queue_is_first_time_too() -> None:
    assert not (set(v._ROUND5_QUEUE) & v._PAST_DRIVER_GREEN)
    assert not (set(v._ROUND5_QUEUE) & set(v._ANCHORS + v._ROTATION))


def test_priority_names_all_registered() -> None:
    assert set(v._PRIORITY) <= set(v.REGISTRY)


def test_round6_pool_is_a_full_first_time_rotation() -> None:
    # exactly the 45 rotation slots round 6 needs, every name
    # never-driver-checked and disjoint from every earlier block
    assert len(v._ROUND6_POOL) == 45
    assert not (set(v._ROUND6_POOL) & v._PAST_DRIVER_GREEN)
    assert not (set(v._ROUND6_POOL) & set(v._ANCHORS + v._ROTATION))
    assert not (set(v._ROUND6_POOL) & set(v._ROUND5_QUEUE))
    assert set(v._ROUND6_POOL) <= set(v.REGISTRY)


def test_round7_pool_is_first_time_and_disjoint() -> None:
    # fills toward round 7's 45 rotation slots; same first-time and
    # disjointness contract as the earlier blocks, size may still grow
    assert 0 < len(v._ROUND7_POOL) <= 45
    assert not (set(v._ROUND7_POOL) & v._PAST_DRIVER_GREEN)
    assert not (set(v._ROUND7_POOL) & set(v._ANCHORS + v._ROTATION))
    assert not (set(v._ROUND7_POOL) & set(v._ROUND5_QUEUE))
    assert not (set(v._ROUND7_POOL) & set(v._ROUND6_POOL))
    assert set(v._ROUND7_POOL) <= set(v.REGISTRY)
