"""Generate component/parameter documentation artifacts into docs/.

Equivalent of the reference's ``rscm-doc-gen`` CLI + ``make docs`` flow
(``crates/rscm-doc-gen/src/main.rs``, ``Makefile:79-83``): emits
- docs/component_metadata/<Component>.json  (I/O + parameter metadata)
- docs/components/<Component>.md            (markdown reference pages)
- docs/magicc_parameter_coverage.md         (.CFG support report)

Run: python scripts/generate_docs.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    # import the component libraries so everything registers
    import rscm_tpu.components  # noqa: F401
    import rscm_tpu.magicc  # noqa: F401
    from rscm_tpu.config import export_component_metadata, generate_component_docs
    from rscm_tpu.config.models.magicc import get_coverage_report
    from rscm_tpu.core.component import Component

    here = os.path.join(os.path.dirname(__file__), "..", "docs")
    os.makedirs(os.path.join(here, "components"), exist_ok=True)

    metadata = export_component_metadata(os.path.join(here, "component_metadata"))
    for name, cls in sorted(Component.get_registered_components().items()):
        with open(os.path.join(here, "components", f"{name}.md"), "w") as f:
            f.write(generate_component_docs(cls))

    with open(os.path.join(here, "magicc_parameter_coverage.md"), "w") as f:
        f.write(get_coverage_report())

    print(f"Wrote metadata for {len(metadata)} components to docs/")


if __name__ == "__main__":
    main()
