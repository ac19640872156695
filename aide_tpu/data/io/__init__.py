from aide_tpu.data.io.dicom import read_dicom, DicomFile  # noqa: F401
from aide_tpu.data.io.nifti import read_nifti, write_nifti  # noqa: F401
from aide_tpu.data.io.nrrd import read_nrrd, write_nrrd  # noqa: F401
from aide_tpu.data.io.png import read_mask, write_mask, read_image_rgb  # noqa: F401
