"""PySpark-native analytics engine with the query/data-processing surface of
``eldigo/ha-sqllite-2-influxdb`` (reference: an HA-recorder-SQLite → InfluxDB
incremental ETL, ``/root/reference/sqllite2influxdb.py``), rebuilt Spark-first
and extended with large-scale training-data pipeline operators (dedup,
similarity search, text analysis, multimodal columns).

Design: everything is declarative DataFrame/SQL so Catalyst handles pushdown,
pruning, join strategy and AQE; Python touches rows only in Arrow-batched
Pandas UDFs (sink rendering, multimodal decode stubs).
"""

__version__ = "0.1.0"
