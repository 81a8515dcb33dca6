"""Native DataFrame operators: the SQL-expressible faces of SURVEY.md §2
plus the large-scale training-data operators (dedup, similarity, text stats).
"""
