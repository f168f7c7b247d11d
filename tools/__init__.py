"""Repo maintenance tools (strict oracle sweep, bench helpers)."""
