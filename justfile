# Task runner mirroring the reference's justfile (check/test/package recipes)

default:
    @just --list

# lint-ish: compile-check all modules
check:
    python -m compileall -q retto_tpu tests tools bench.py __graft_entry__.py

test:
    python -m pytest tests/ -x -q

test-fast:
    python -m pytest tests/ -x -q -m "not slow"

bench:
    python bench.py

train:
    python tools/train_synthetic.py all

serve:
    python -c "from retto_tpu.cli import main; main(['serve'])"
