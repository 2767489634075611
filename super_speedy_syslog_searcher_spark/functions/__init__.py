"""Scalar-function surface (SURVEY.md §2.9): vectorized parse +
canonicalize, all Arrow-batched — never row-at-a-time Python."""
