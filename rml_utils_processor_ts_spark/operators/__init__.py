"""Distributed operators: term-map projection + plan executor (the RML
algebra, SURVEY.md §2.B), CDC state ops, entity linking, connected
components, dedup family, ANN similarity, text analytics.
"""
