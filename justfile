# Task runner mirroring the reference's justfile (check/test/package recipes)

default:
    @just --list

# lint gates (reference gates on fmt + clippy-deny-warnings, justfile:9-17):
# compile-check + AST linter (tools/lint.py; ruff/mypy not installed here)
check:
    python -m compileall -q retto_tpu tests tools bench.py __graft_entry__.py
    python tools/lint.py

# fast gate (skips slow-marked e2e/training tests)
test:
    python -m pytest tests/ -x -q -m "not slow"

# the full suite
test-all:
    python -m pytest tests/ -x -q

bench:
    python bench.py

train:
    python tools/train_synthetic.py all

serve:
    python -c "from retto_tpu.cli import main; main(['serve'])"

# reference-parity harness (needs the PP-OCRv4 artifacts; network-gated)
parity-record:
    python tools/parity.py record --models ppocr_v4 --out parity_goldens.json

parity-check:
    python tools/parity.py check --models ppocr_v4 --goldens parity_goldens.json
