"""CLI entry points: neraf-train, neraf-eval, neraf-render."""
