#!/bin/sh
# Install the pre-commit smoke hook (see tools/smoke.py for why).
# Run once per clone: sh tools/install_hooks.sh
set -e
repo_root="$(git rev-parse --show-toplevel)"
hook="$repo_root/.git/hooks/pre-commit"
cat > "$hook" <<'HOOK'
#!/bin/sh
# Smoke-check: the engine must import and the registry must load
# before any commit (round-7 regression guard). Defensive: if no
# python or the repo layout is unavailable, do NOT block the commit.
repo_root="$(git rev-parse --show-toplevel 2>/dev/null)" || exit 0
[ -f "$repo_root/tools/smoke.py" ] || exit 0
if command -v python >/dev/null 2>&1; then py=python
elif command -v python3 >/dev/null 2>&1; then py=python3
else exit 0
fi
cd "$repo_root" && "$py" tools/smoke.py
HOOK
chmod +x "$hook"
echo "installed $hook"
