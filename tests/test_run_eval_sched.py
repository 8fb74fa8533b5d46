"""Scene-level job scheduler of scripts/run_eval.py (VERDICT r1 item 10:
the reference runs one scene per free GPU, run_eval.sh:42-50,145-165)."""

import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from run_eval import schedule_scenes, slot_environment  # noqa: E402


def test_scenes_overlap_and_slots_are_exclusive():
    lock = threading.Lock()
    active = 0
    max_active = 0
    slots_in_use = set()
    seen_slots = []

    def scene(slot):
        nonlocal active, max_active
        with lock:
            assert slot not in slots_in_use  # a slot never runs 2 scenes
            slots_in_use.add(slot)
            active += 1
            max_active = max(max_active, active)
            seen_slots.append(slot)
        time.sleep(0.15)
        with lock:
            active -= 1
            slots_in_use.discard(slot)
        return True

    results = schedule_scenes([scene] * 5, n_jobs=2)
    assert results == [True] * 5
    assert max_active == 2          # scenes actually overlapped
    assert set(seen_slots) <= {0, 1}


def test_sequential_default_and_result_order():
    order = []

    def mk(i):
        def f(slot):
            order.append(i)
            return i != 1  # scene 1 "fails"
        return f

    results = schedule_scenes([mk(i) for i in range(3)], n_jobs=1)
    assert order == [0, 1, 2]
    assert results == [True, False, True]


def test_slot_environment_pins_devices(monkeypatch):
    monkeypatch.delenv("TPU_VISIBLE_DEVICES", raising=False)
    monkeypatch.delenv("CUDA_VISIBLE_DEVICES", raising=False)
    env1 = slot_environment(0, n_jobs=1)
    assert "TPU_VISIBLE_DEVICES" not in env1  # single job: untouched env
    env2 = slot_environment(3, n_jobs=4)
    assert env2["TPU_VISIBLE_DEVICES"] == "3"
    assert env2["CUDA_VISIBLE_DEVICES"] == "3"
    # an operator-set binding wins
    monkeypatch.setenv("TPU_VISIBLE_DEVICES", "7")
    assert slot_environment(2, n_jobs=4)["TPU_VISIBLE_DEVICES"] == "7"
