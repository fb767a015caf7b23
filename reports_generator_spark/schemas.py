"""Dynamic schema generation + typed view layer.

`generate_schema` is the engine's equivalent of Proof.scala:276-284:
a config-driven all-string nullable schema (the reference's only use
of Spark's type system). `typed_view` adds the cast layer the
reference implies but never builds — counts/sizes to BIGINT,
dates to TIMESTAMP, SI/NO back to BOOLEAN — as a *view over* the
string core, never mutating the stored contract.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

#: columns carrying integer counts/sizes in the ERP/ISU contract
_LONG_COLS = (
    "CONTEO_CABECERA_ASIGNADO_ENVIADO_POR_EL_SISTEMA",
    "CONTEO_CABECERA_POR_ARCHIVO",
    "TAMANO_DE_ARCHIVO_BYTES",
    "TOTAL_COLUMNAS_PREPARACION_DE_MARCO_DE_DATOS",
    "TOTAL_REGISTROS_PREPARACION_DE_MARCO_DE_DATOS",
    "DIFERENCIA_TOTAL_COLUMNAS",
    "DIFERENCIA_TOTAL_REGISTROS",
    "TOTAL_COLUMNAS_OFICIAL",
    "TOTAL_REGISTROS_OFICIAL",
    "TAMANO_ZIP_BYTES",
)
_TS_COLS = ("GEBERATION_DATE",)
_BOOL_SI_NO_COLS = ("CABECERAS_IGUALES",)


def generate_schema(headers: Iterable[str]) -> StructType:
    """All-string nullable schema from a header list
    (Proof.scala:276-284 semantics, order-preserving)."""
    return StructType([StructField(h, StringType(), True) for h in headers])


def typed_view(df: DataFrame) -> DataFrame:
    """Best-effort typed projection over the string contract."""
    cols = []
    for f_ in df.schema.fields:
        c = F.col(f_.name)
        if f_.name in _LONG_COLS:
            c = c.cast("bigint")
        elif f_.name in _TS_COLS:
            c = c.cast("timestamp")
        elif f_.name in _BOOL_SI_NO_COLS:
            c = F.when(F.col(f_.name) == "SI", True).when(
                F.col(f_.name) == "NO", False
            )
        cols.append(c.alias(f_.name))
    return df.select(*cols)
