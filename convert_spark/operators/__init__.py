"""Pipeline stages — each a pure ``DataFrame -> DataFrame`` function.

Stage graph (SURVEY.md §3.4):

    read pages -> extract (Arrow UDF) -> normalize/project (exprs)
      -> tile index (exprs) -> spatial joins (broadcast STRtree PIP,
      tile equi-join, kNN ring) -> per-tile aggregation (bbox/center/
      S2 covering) -> MineAR JSON sink

plus the training-data suite: dedup, similarity search, text analysis,
rollups, multimodal plumbing.
"""
