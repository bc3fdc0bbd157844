"""Operator modules (SURVEY.md §2).

Each public function takes DataFrames in and returns a DataFrame — no
actions, no collects — so Catalyst sees one end-to-end plan per query.
"""
