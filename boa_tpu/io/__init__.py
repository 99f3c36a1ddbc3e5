"""Host-side I/O: NIfTI codec, orientation math, xlsx writer, DICOM glue."""
