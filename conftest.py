# Ensures the repo root is importable in tests (pytest rootdir insertion).
