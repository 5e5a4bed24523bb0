#!/usr/bin/env bash
# Installs the repo's git hooks (currently: pre-commit test-green gate).
set -euo pipefail
cd "$(dirname "$0")/.."
cp tools/pre-commit .git/hooks/pre-commit
chmod +x .git/hooks/pre-commit tools/pre-commit tools/gate.sh
echo "hooks installed: pre-commit (test-green gate)"
