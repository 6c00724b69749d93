from haplohyped_tpu.data.cohort import CohortTensors
from haplohyped_tpu.data.genome import GenomeTensors
from haplohyped_tpu.data.regions import load_bed_regions, calculate_midpoint_region
from haplohyped_tpu.data.sampler import DeviceHaplotypeSampler
from haplohyped_tpu.data.haplotype_dataset import RandomHaplotypeDataset

__all__ = [
    "RandomHaplotypeDataset",
    "CohortTensors",
    "GenomeTensors",
    "load_bed_regions",
    "calculate_midpoint_region",
    "DeviceHaplotypeSampler",
]
