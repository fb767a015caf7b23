"""Pipeline configuration and schema-variant (module) registry.

Mirrors the reference's stringly-typed `properties` map
(Proof.scala:19-29) as a typed dataclass, and its ERP/ISU module
dispatch (Proof.scala:80-81, module/ERP.scala, module/ISU.scala) as a
header registry parameterizing ONE generic pipeline.

The 27 Spanish ERP column names are the public data contract
(Proof.scala:27 — including the `GEBERATION_DATE` typo, preserved
verbatim: downstream consumers of the reference's parquet depend on
it). ISU adds 5 zip-related fields (ISU.scala:19-23's infoFile/zip*
block) — declared in the reference but never wired (readFilesISU is an
empty TODO at Proof.scala:219-224); here ISU is a first-class variant.
"""

from __future__ import annotations

from dataclasses import dataclass, field

#: Proof.scala:27 — verbatim contract, order fixed.
ERP_HEADERS: tuple[str, ...] = (
    "MODULO",
    "TIPO_DE_REPORTE",
    "RUTA_DE_REPORTE",
    "FECHA_DE_GENERACION_DE_REPORTE",
    "ARCHIVO_PROCESADO",
    "NOMBRE_DE_TABLA_ASIGNADO_EN_LANDING_RAW_POR_ARCHIVO",
    "NOMBRE_DE_TABLA_ASIGNADO_EN_LOS_PARAMETROS",
    "CABECERA_ASIGNADA",
    "CONTEO_CABECERA_ASIGNADO_ENVIADO_POR_EL_SISTEMA",
    "CONTEO_CABECERA_POR_ARCHIVO",
    "CABECERA_IDENTIFICADA_EN_EL_ARCHIVO",
    "CABECERAS_IGUALES",
    "NOMBRE_DE_DIRECTORIO",
    "RUTA_EN_LANDING_RAW_ARCHIVO_SIN_TRANSFORMAR",
    "TAMANO_DE_ARCHIVO_BYTES",
    "VALIDACION_SHA",
    "FORMATO_DE_ALMACENAMIENTO_DE_ARCHIVO_TRANSFORMADO",
    "NOMBRE_TABLA",
    "RUTA_EN_LANDINGRAW",
    "TOTAL_COLUMNAS_PREPARACION_DE_MARCO_DE_DATOS",
    "TOTAL_REGISTROS_PREPARACION_DE_MARCO_DE_DATOS",
    "DIFERENCIA_TOTAL_COLUMNAS",
    "DIFERENCIA_TOTAL_REGISTROS",
    "TOTAL_COLUMNAS_OFICIAL",
    "TOTAL_REGISTROS_OFICIAL",
    "ESTADO_DEL_PROCESO",
    "GEBERATION_DATE",
)

#: ISU = ERP contract + the zip-archive block (ISU.scala:19-23),
#: inserted after the date column to match the case-class field order.
ISU_EXTRA_HEADERS: tuple[str, ...] = (
    "INFO_FILE",
    "NOMBRE_ZIP",
    "DIRECTORIO_ZIP",
    "RUTA_ZIP",
    "TAMANO_ZIP_BYTES",
)

ISU_HEADERS: tuple[str, ...] = (
    ERP_HEADERS[:4] + ISU_EXTRA_HEADERS + ERP_HEADERS[4:]
)

#: Main.scala:44-63 — the 20-column PROTOTYPE grammar (the evolutionary
#: ancestor of the 27-column ERP contract): the bare positional fields
#: f(1)-f(8), f(11)-f(22) of splitInfo (Main.scala:109-112), no
#: enrichment columns. Preserved verbatim, parentheses included.
MAIN_PROTO_HEADERS: tuple[str, ...] = (
    "ARCHIVO_PROCESADO",
    "NOMBRE_DE_TABLA_ASIGNADO_EN_LANDING_RAW_POR_ARCHIVO",
    "NOMBRE_DE_TABLA_ASIGNADO_EN_LOS_PARAMETROS",
    "CABECERA_ASIGNADA",
    "CONTEO_CABECERA_ASIGNADO_ENVIADO_POR_EL_SISTEMA",
    "CONTEO_CABECERA_POR_ARCHIVO",
    "CABECERA_IDENTIFICADA_EN_EL_ARCHIVO",
    "CABECERAS_IGUALES",
    "NOMBRE_DE_DIRECTORIO",
    "RUTA_EN_LANDING_RAW_ARCHIVO_SIN_TRANSFORMAR",
    "TAMANO_DE_ARCHIVO_(BYTES)",
    "VALIDACION_SHA",
    "FORMATO_DE_ALMACENAMIENTO_DE_ARCHIVO_TRANSFORMADO",
    "NOMBRE_TABLA",
    "RUTA_EN_LANDINGRAW",
    "TOTAL_COLUMNAS_PREPARACION_DE_MARCO_DE_DATOS",
    "TOTAL_REGISTROS_PREPARACION_DE_MARCO_DE_DATOS",
    "TOTAL_COLUMNAS_OFICIAL",
    "TOTAL_REGISTROS_OFICIAL",
    "ESTADO_DEL_PROCESO",
)

#: module name -> ordered public column names
MODULE_HEADERS: dict[str, tuple[str, ...]] = {
    "ERP": ERP_HEADERS,
    "ISU": ISU_HEADERS,
    "MAIN": MAIN_PROTO_HEADERS,
}


@dataclass
class ReportConfig:
    """Typed equivalent of the reference's properties map
    (Proof.scala:19-29, extracted at Proof.scala:39-43)."""

    input_dir: str
    output_parquet: str
    output_csv: str
    module: str = "ERP"
    ext_file: str = ".TXT"
    charset: str = "UTF-8"
    #: value terminating a record block (Proof.scala:106 `limitBlock`)
    limit_block_key: str = "status"
    #: key whose boolean value localizes to SI/NO (Proof.scala:107)
    boolean_caster_key: str = "equalsHeaders"
    #: content word classifying report type (Proof.scala:255-256)
    report_type_match: str = "parquet"
    report_type_message: str = "Generación de Parquet"
    #: override for deterministic tests; None -> current_timestamp()
    generation_date: str | None = None
    headers: tuple[str, ...] = field(default_factory=tuple)

    def __post_init__(self) -> None:
        if not self.headers:
            if self.module not in MODULE_HEADERS:
                raise ValueError(f"unknown module {self.module!r}")
            self.headers = MODULE_HEADERS[self.module]
