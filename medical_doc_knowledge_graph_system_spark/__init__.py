"""PySpark-native knowledge-graph construction engine.

From-scratch reimplementation of the reference pipeline semantics
(darthmanwe/Medical_Doc_Knowledge_Graph_System) over Common-Crawl-style web
pages: chunk -> extract -> resolve -> materialize graph, plus the retrieval
query operators, built Spark-first (DataFrame/Catalyst/Arrow pandas UDFs).
"""
