"""pandrs_spark — PySpark-native analytics engine (pandrs capability parity)."""

__version__ = "0.1.0"
