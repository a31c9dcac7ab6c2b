"""Pure-Python shim of the google.protobuf runtime — just enough for
Spark's generated StateMessage_pb2 module (transformWithStateInPandas
worker protocol). Built only from the PUBLIC protobuf wire-format and
descriptor.proto specifications; activate via
azure_data_engineering_spark.compat.ensure_protobuf(), which prefers a
real protobuf installation when one exists."""

__version__ = "6.33.0+purepb-shim"
