"""Vendored ``google`` namespace root for the protobuf mini-runtime.

Only ever importable when the real ``google.protobuf`` is absent —
``kyiv_traffic_bigdata_spark.protoshim.ensure_protobuf`` probes the
real package first and never shadows it. Declared as a namespace
package so a real ``google.*`` distribution appearing later on
sys.path still merges cleanly.
"""

__path__ = __import__("pkgutil").extend_path(__path__, __name__)
