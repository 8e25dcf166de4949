"""Relational operator library — the Catalyst-optimizable cores of every
SURVEY.md §2 operator. All functions are DataFrame -> DataFrame (or
Column helpers); no RDDs, no driver-side loops.
"""
