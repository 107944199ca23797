"""Device-ready per-drug modality batch.

The array-ified analog of the reference collator's per-drug dict
(reference: madrigal/data/data.py:948-974 -- {drugs, strs, cv, tx, masks});
transcriptomics inputs are stacked [num_cell_lines, B, ...] instead of a
per-cell-line dict so the chemCPA encoder runs as one [16*B] matmul batch
(reference concatenates the same way at models.py:756-769).
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp

from .molgraph import MolGraphBatch


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DrugModalityBatch:
    """All modality inputs for a batch of B drugs.

    masks: [B, NUM_MODALITIES] bool, True = modality MISSING (key-padding
    convention, reference data.py:944-946).
    kg_rows: [B] int32 row into the KG drug-node table, -1 when the drug is
    not in the KG (gathered output is zeroed; masked downstream).
    """

    drugs: jnp.ndarray  # [B] int32 global drug ids
    mols: MolGraphBatch
    kg_rows: jnp.ndarray  # [B] int32
    cv: jnp.ndarray  # [B, CV_INPUT_DIM]
    tx_sigs: jnp.ndarray  # [C, B, TX_INPUT_DIM]
    tx_dosages: jnp.ndarray  # [C, B]
    masks: jnp.ndarray  # [B, M] bool
    extra_tabular: Dict[str, jnp.ndarray] = dataclasses.field(
        default_factory=dict
    )

    @property
    def batch_size(self) -> int:
        return self.drugs.shape[0]
