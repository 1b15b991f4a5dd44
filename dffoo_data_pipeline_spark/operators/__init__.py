"""Composite operators built from DataFrame primitives.

Each operator is a pure DataFrame → DataFrame function (no collect, no
driver loops) so it composes into larger plans and scales with the
cluster.
"""
