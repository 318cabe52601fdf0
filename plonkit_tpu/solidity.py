"""Solidity verifier codegen: renders the handlebars-style template
(contrib/template.sol) with the verification-key constants.

Behavioral parity: bellman_vk_codegen::render_verification_key (SURVEY D4).
The default template is a verbatim copy of the reference template semantics
re-expressed by this renderer's substitution map; a custom template path can
be supplied just like `plonkit generate-verifier -t`."""

import os
import re
from typing import Dict

from .fields import get_domain_omega
from .serialization import VerificationKey

_TEMPLATE_PATH = os.path.join(os.path.dirname(__file__), "data", "template.sol")


def _vk_placeholders(vk: VerificationKey) -> Dict[str, str]:
    def pt(p):
        if p is None:
            return ("0", "0")
        return (str(p[0]), str(p[1]))

    ph = {
        "domain_size": str(vk.domain_size),
        "num_inputs": str(vk.num_inputs),
        "omega": str(get_domain_omega(vk.domain_size)),
    }
    for i, c in enumerate(vk.selector_commitments):
        x, y = pt(c)
        ph[f"selector_commitment_{i}_0"] = x
        ph[f"selector_commitment_{i}_1"] = y
    for i, c in enumerate(vk.next_step_selector_commitments):
        x, y = pt(c)
        ph[f"next_step_selector_commitment_{i}_0"] = x
        ph[f"next_step_selector_commitment_{i}_1"] = y
    for i, c in enumerate(vk.permutation_commitments):
        x, y = pt(c)
        ph[f"permutation_commitment_{i}_0"] = x
        ph[f"permutation_commitment_{i}_1"] = y
    for i, v in enumerate(vk.non_residues):
        ph[f"permutation_non_residue_{i}"] = str(v)
    (x0, x1), (y0, y1) = vk.g2_elements[1]
    ph["g2_x_x_c0"] = str(x0)
    ph["g2_x_x_c1"] = str(x1)
    ph["g2_x_y_c0"] = str(y0)
    ph["g2_x_y_c1"] = str(y1)
    return ph


def render_verification_key(vk: VerificationKey, template_path: str = None) -> str:
    path = template_path or _TEMPLATE_PATH
    with open(path) as f:
        template = f.read()
    ph = _vk_placeholders(vk)

    def repl(m):
        key = m.group(1).strip()
        if key not in ph:
            raise KeyError(f"template placeholder {{{{{key}}}}} has no value")
        return ph[key]

    return re.sub(r"\{\{([^}]+)\}\}", repl, template)


def render_verification_key_to_file(vk: VerificationKey, out_path: str,
                                    template_path: str = None) -> None:
    with open(out_path, "w") as f:
        f.write(render_verification_key(vk, template_path))


def render_recursive_verification_key_to_file(old_vk, new_vk, num_inputs: int,
                                              out_path: str,
                                              template_path: str = None):
    """Recursive (aggregated) verifier contract codegen -- the analogue of
    the reference's solidity_recursive_plonk_verifier crate
    (src/bin/main.rs:459-481, SURVEY D5).  The on-chain verifier for the
    extended gate system is scheduled work; the native pipeline
    (recursive-prove / recursive-verify / check-aggregation) is complete."""
    raise NotImplementedError(
        "recursive verifier contract generation is not implemented yet; "
        "use `recursive-verify` for native verification")
