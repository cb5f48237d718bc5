#!/bin/sh
# Install the repo's git hooks. Run once after clone.
cd "$(git rev-parse --show-toplevel)" || exit 1
cat > .git/hooks/pre-commit <<'HOOK'
#!/bin/sh
exec python3 scripts/precommit_check.py
HOOK
chmod +x .git/hooks/pre-commit
echo "pre-commit hook installed"
