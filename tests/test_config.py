"""Config system tests: the reference's template.yaml + group_config.json
semantics (merge, ${} interpolation, active flags) must work unchanged."""

import textwrap

from mvoc_tpu import config as oc


def test_basic_attribute_access():
    cfg = oc.create({"a": 1, "b": {"c": "x"}})
    assert cfg.a == 1
    assert cfg.b.c == "x"
    assert cfg["b"]["c"] == "x"


def test_interpolation_simple_and_nested():
    cfg = oc.create(
        textwrap.dedent(
            """
            data_dir: ".."
            model_name: "i2vgen-xl"
            exp_name: "${video_name}"
            inv_dir: "inversions"
            output_dir: "${data_dir}/${inv_dir}/${model_name}/${exp_name}"
            video_name: "boat_surf"
            """
        )
    )
    assert cfg.exp_name == "boat_surf"
    assert cfg.output_dir == "../inversions/i2vgen-xl/boat_surf"


def test_interpolation_resolves_against_merged_root():
    # Values merged later must retroactively affect templated paths.
    template = oc.create({"video_name": "ReplaceMe", "out": "${video_name}/x"})
    merged = oc.merge(template, {"video_name": "duck_crane"})
    assert merged.out == "duck_crane/x"


def test_nested_section_interpolation():
    template = oc.create(
        textwrap.dedent(
            """
            image_size: [256, 128]
            n_frames: 16
            output_dir: "base"
            inverse_config:
                image_size: ${image_size}
                n_frames: ${n_frames}
                output_dir: "${output_dir}/ddim_latents"
            recon_config:
                ddim_latents_path: "${inverse_config.output_dir}"
            """
        )
    )
    assert template.inverse_config.image_size == [256, 128]
    assert template.inverse_config.n_frames == 16
    assert template.recon_config.ddim_latents_path == "base/ddim_latents"


def test_deep_merge_overrides_nested_keys():
    template = oc.create({"recon_config": {"enable_recon": False, "n_steps": 50}})
    merged = oc.merge(template, {"recon_config": {"enable_recon": True}})
    assert merged.recon_config.enable_recon is True
    assert merged.recon_config.n_steps == 50


def test_merge_replaces_lists_wholesale():
    merged = oc.merge({"obj_mask_path": ""}, {"obj_mask_path": ["a", "b"]})
    assert merged.obj_mask_path == ["a", "b"]


def test_reference_templates_load_and_merge(tmp_path):
    """The actual reference templates must parse and interpolate."""
    for name in ("group_inversion", "group_composite"):
        cfg = oc.load(f"/root/reference/i2vgen-xl/configs/{name}/template.yaml")
        entries = oc.load_json_list(
            f"/root/reference/i2vgen-xl/configs/{name}/group_config.json"
        )
        assert len(entries) == 7
        merged = oc.merge(cfg, entries[0])
        assert merged.n_frames == 16
        assert merged.image_size == [1280, 720]
        if name == "group_inversion":
            assert merged.inverse_config.n_steps == 500
            assert merged.inverse_config.cfg == 1.0
            assert merged.video_name == "boat_surf"
            # interpolated output path picks up the merged video_name
            assert "boat_surf" in merged.output_dir
        else:
            assert merged.cfg == 9.0
            assert merged.pnp_spatial_attn_t == 1.0
            assert merged.obj_mask_path == [
                "demo/boat_surf/boat_mask",
                "demo/boat_surf/surf_mask",
            ]


def test_replaceme_detection():
    cfg = oc.create({"a": "ReplaceMe", "b": "fine", "c": ["x", "ReplaceMe"]})
    assert sorted(oc.check_no_replaceme(cfg)) == ["a", "c"]


def test_to_yaml_roundtrip():
    cfg = oc.create({"a": 1, "b": {"c": [1, 2]}})
    again = oc.create(oc.to_yaml(cfg))
    assert again == cfg
